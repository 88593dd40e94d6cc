"""End-to-end test of the HTTP serving endpoint (scripts/serve_model.py):
start the real server on a loopback port, POST a WAV, read the enhanced
WAV back."""

import http.client
import io
import json
import os
import sys
import threading

import jax
import numpy as np
import yaml

from brever_tpu.audio import read_wav, write_wav
from brever_tpu.checkpoint import save_checkpoint
from brever_tpu.models import ModelRegistry

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'scripts'))

TINY = dict(filters=32, filter_length=16, bottleneck_channels=16,
            hidden_channels=32, skip_channels=16, layers=2, repeats=1)


def _make_model_dir(tmp_path):
    model = ModelRegistry.get('convtasnet')(**TINY)
    variables = model.init_variables(jax.random.PRNGKey(0))
    model_dir = tmp_path / 'model'
    (model_dir / 'checkpoints').mkdir(parents=True)
    with open(model_dir / 'config.yaml', 'w') as f:
        yaml.dump({'arch': 'convtasnet', 'model': TINY}, f)
    save_checkpoint(model_dir / 'checkpoints' / 'last.ckpt',
                    {'params': variables['params'], 'aux': {}})
    return str(model_dir)


def test_serve_model_http(tmp_path):
    from serve_model import make_server

    server, service = make_server(
        _make_model_dir(tmp_path), port=0, warmup=False)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        conn = http.client.HTTPConnection('127.0.0.1', port, timeout=120)

        conn.request('GET', '/health')
        resp = conn.getresponse()
        health = json.loads(resp.read())
        assert resp.status == 200
        assert health['arch'] == 'convtasnet'
        assert health['params'] > 0

        x = (np.random.RandomState(0).randn(4000) * 0.1).astype('float32')
        buf = io.BytesIO()
        write_wav(buf, x[:, None], 16000)
        conn.request('POST', '/enhance', body=buf.getvalue(),
                     headers={'Content-Type': 'audio/wav'})
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        out, fs = read_wav(io.BytesIO(resp.read()), always_2d=True)
        assert fs == 16000
        assert out.shape[0] == 4000
        assert np.isfinite(out).all()

        # malformed payload -> clean 400
        conn.request('POST', '/enhance', body=b'not a wav')
        resp = conn.getresponse()
        assert resp.status == 400
        assert b'bad WAV payload' in resp.read()

        conn.request('GET', '/nope')
        assert conn.getresponse().status == 404
    finally:
        server.shutdown()


def test_serve_model_streaming(tmp_path):
    from serve_model import make_server

    model = ModelRegistry.get('convtasnet')(causal=True, **TINY)
    variables = model.init_variables(jax.random.PRNGKey(0))
    model_dir = tmp_path / 'model'
    (model_dir / 'checkpoints').mkdir(parents=True)
    with open(model_dir / 'config.yaml', 'w') as f:
        yaml.dump({'arch': 'convtasnet',
                   'model': {**TINY, 'causal': True}}, f)
    save_checkpoint(model_dir / 'checkpoints' / 'last.ckpt',
                    {'params': variables['params'], 'aux': {}})

    server, service = make_server(str(model_dir), port=0, warmup=False)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        n = 10000  # not a multiple of the 4096-sample step
        x = (np.random.RandomState(0).randn(n) * 0.1).astype('<f4')
        raw = x.tobytes()
        blocks = [raw[i:i + 3000] for i in range(0, len(raw), 3000)]
        conn = http.client.HTTPConnection('127.0.0.1', port, timeout=300)
        conn.request('POST', '/enhance_stream', body=iter(blocks),
                     encode_chunked=True,
                     headers={'Transfer-Encoding': 'chunked'})
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 200, body
        out = np.frombuffer(body, '<f4')
        assert out.shape == (n,)
        assert np.isfinite(out).all()

        # streamed output must equal the direct streaming pipeline
        from brever_tpu.streaming import StreamingEnhancer
        enh = StreamingEnhancer(model, variables, 4096)
        state = enh.init_state(1)
        ref = []
        padded = np.concatenate([x, np.zeros(4096 * 3 - n, np.float32)])
        for i in range(0, len(padded), 4096):
            state, o = enh.step(state, padded[None, i:i + 4096])
            ref.append(np.asarray(o).reshape(-1))
        ref = np.concatenate(ref)[:n]
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        server.shutdown()

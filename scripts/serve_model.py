"""Serve a trained model over HTTP (stdlib-only inference endpoint).

Production-serving surface the reference does not have: loads a model
directory (same layout as train_model.py produces), warms one jitted
enhance executable, and answers

* ``GET /health`` — JSON: architecture, parameter count, sample rate
* ``POST /enhance`` — body: a WAV file; response: the enhanced WAV
  (mono float32 at the model sample rate)
* ``POST /enhance_stream`` — body: raw float32 LE mono PCM, sent with
  chunked transfer encoding; processed incrementally through the
  stateful streaming pipeline (:mod:`brever_tpu.streaming`) in
  constant memory, response is the enhanced raw PCM. Causal models
  only (causal Conv-TasNet / DCCRN).

Requests are serialized through one device executable (single-chip
serving; scale-out is one process per chip behind any load balancer).

    python scripts/serve_model.py <model_dir> [--host 127.0.0.1]
        [--port 8000] [--best <metric>]
"""

import argparse
import importlib.util
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from brever_tpu.audio import read_wav, write_wav  # noqa: E402
from brever_tpu.config import get_config  # noqa: E402
from brever_tpu.models import count_params  # noqa: E402


def _load_test_model_module():
    spec = importlib.util.spec_from_file_location(
        'test_model', os.path.join(os.path.dirname(
            os.path.abspath(__file__)), 'test_model.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class EnhanceService:
    """Owns the model + variables and serializes enhance calls."""

    def __init__(self, model_dir, best=None):
        import jax

        tm = _load_test_model_module()
        cfg = get_config(os.path.join(model_dir, 'config.yaml'))
        ckpt_dir = os.path.join(model_dir, 'checkpoints')
        if best:
            ckpt = tm.find_best_checkpoint(ckpt_dir, best)
        else:
            ckpt = os.path.join(ckpt_dir, 'last.ckpt')
        self.model, self.variables = tm.load_model(model_dir, ckpt, cfg)
        self.arch = cfg.arch
        self.fs = getattr(self.model, 'fs', 16000)
        self.n_params = count_params(self.variables['params'])
        self.checkpoint = os.path.basename(ckpt)
        self._lock = threading.Lock()
        self._jax = jax

    def warmup(self, n_samples=16000):
        x = np.zeros((1, 2, n_samples), np.float32)
        self.enhance(x[0].T)

    def enhance(self, audio):
        """audio: (samples,) or (samples, channels) float -> (samples,)
        enhanced mono."""
        import jax.numpy as jnp

        audio = np.atleast_2d(np.asarray(audio, np.float32))
        if audio.shape[0] > audio.shape[1]:
            audio = audio.T                       # -> (channels, samples)
        if audio.shape[0] == 1:
            audio = np.repeat(audio, 2, axis=0)   # models expect binaural
        with self._lock:
            out = self.model.enhance(
                self.variables, jnp.asarray(audio[None]))
        out = np.asarray(out)[0]
        if out.ndim > 1:
            out = out[0]
        return out[:audio.shape[1]]

    def health(self):
        return {
            'status': 'ok',
            'arch': self.arch,
            'params': int(self.n_params),
            'fs': int(self.fs),
            'checkpoint': self.checkpoint,
        }

    # -- streaming -------------------------------------------------------

    STREAM_CHUNK = 4096  # samples per streaming step

    def streamer(self):
        """Cached stateful-streaming pipeline; raises ValueError for
        architectures without a streaming twin."""
        if not hasattr(self, '_streamer'):
            from brever_tpu.streaming import (StreamingDCCRN,
                                              StreamingEnhancer)
            try:
                if self.arch == 'dccrn':
                    self._streamer = StreamingDCCRN(
                        self.model, self.variables, self.STREAM_CHUNK)
                else:
                    self._streamer = StreamingEnhancer(
                        self.model, self.variables, self.STREAM_CHUNK)
            except (TypeError, ValueError) as e:
                self._streamer = ValueError(str(e))
        if isinstance(self._streamer, ValueError):
            raise self._streamer
        return self._streamer

    def stream_blocks(self, blocks):
        """Generator: raw f32 LE PCM byte blocks in -> enhanced byte
        blocks out, one streaming step per STREAM_CHUNK samples."""
        enh = self.streamer()
        chunk_bytes = self.STREAM_CHUNK * 4
        state = enh.init_state(1)
        buf = b''
        total_in = 0
        emitted = 0
        for block in blocks:
            buf += block
            total_in += len(block)
            while len(buf) >= chunk_bytes:
                piece, buf = buf[:chunk_bytes], buf[chunk_bytes:]
                x = np.frombuffer(piece, '<f4')[None]
                with self._lock:
                    state, out = enh.step(state, x)
                out = np.asarray(out, np.float32).reshape(-1)
                emitted += out.size
                yield out.tobytes()
        if buf:
            pad = chunk_bytes - len(buf)
            x = np.frombuffer(buf + b'\0' * pad, '<f4')[None]
            with self._lock:
                state, out = enh.step(state, x)
            want = total_in // 4 - emitted
            out = np.asarray(out, np.float32).reshape(-1)[:want]
            yield out.tobytes()


class _Handler(BaseHTTPRequestHandler):
    service = None  # set by make_server

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _reply(self, code, body, content_type):
        self.send_response(code)
        self.send_header('Content-Type', content_type)
        self.send_header('Content-Length', str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path != '/health':
            self._reply(404, b'{"error": "not found"}',
                        'application/json')
            return
        body = json.dumps(self.service.health()).encode()
        self._reply(200, body, 'application/json')

    def _iter_body(self, block=65536):
        """Yield request-body blocks; decodes chunked transfer coding
        (http.server leaves it to handlers)."""
        te = self.headers.get('Transfer-Encoding', '')
        if 'chunked' in te.lower():
            while True:
                line = self.rfile.readline().strip()
                size = int(line.split(b';')[0], 16)
                if size == 0:
                    self.rfile.readline()
                    return
                yield self.rfile.read(size)
                self.rfile.read(2)  # chunk-terminating CRLF
        else:
            remaining = int(self.headers.get('Content-Length', 0))
            while remaining > 0:
                data = self.rfile.read(min(block, remaining))
                if not data:
                    return
                remaining -= len(data)
                yield data

    def do_POST(self):
        if self.path == '/enhance_stream':
            try:
                parts = list(self.service.stream_blocks(
                    self._iter_body()))
            except ValueError as e:
                self._reply(400, json.dumps(
                    {'error': str(e)}).encode(), 'application/json')
                return
            self._reply(200, b''.join(parts), 'application/octet-stream')
            return
        if self.path != '/enhance':
            self._reply(404, b'{"error": "not found"}',
                        'application/json')
            return
        length = int(self.headers.get('Content-Length', 0))
        raw = self.rfile.read(length)
        try:
            audio, fs = read_wav(io.BytesIO(raw), always_2d=True)
        except (ValueError, EOFError) as e:
            self._reply(400, json.dumps(
                {'error': f'bad WAV payload: {e}'}).encode(),
                'application/json')
            return
        if fs != self.service.fs:
            self._reply(400, json.dumps(
                {'error': f'expected {self.service.fs} Hz, got {fs}'}
            ).encode(), 'application/json')
            return
        out = self.service.enhance(audio)
        buf = io.BytesIO()
        write_wav(buf, out[:, None], fs)
        self._reply(200, buf.getvalue(), 'audio/wav')


def make_server(model_dir, host='127.0.0.1', port=0, best=None,
                warmup=True):
    """Build (server, service); caller runs server.serve_forever()."""
    service = EnhanceService(model_dir, best=best)
    if warmup:
        service.warmup()
    handler = type('Handler', (_Handler,), {'service': service})
    return ThreadingHTTPServer((host, port), handler), service


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('model_dir')
    parser.add_argument('--host', default='127.0.0.1')
    parser.add_argument('--port', type=int, default=8000)
    parser.add_argument('--best', default=None)
    parser.add_argument('--device', default=None,
                        help="pin the jax platform (e.g. 'cpu', 'tpu'); "
                        'default: ambient backend')
    args = parser.parse_args()
    if args.device:
        import jax
        jax.config.update('jax_platforms', args.device)
    server, service = make_server(
        args.model_dir, args.host, args.port, args.best)
    h = service.health()
    print(f'serving {h["arch"]} ({h["params"]:,} params, '
          f'{h["checkpoint"]}) on http://{args.host}:'
          f'{server.server_address[1]}', flush=True)
    server.serve_forever()


if __name__ == '__main__':
    main()

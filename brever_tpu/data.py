"""Host-side data pipeline: datasets, tar access, padded collation.

TPU-first design
----------------
The reference runs model ``transform`` pre-processing inside forked
dataloader workers to overlap CPU feature extraction with GPU compute
(reference brever/data.py:23-530). On TPU the idiomatic split is
different: the host pipeline only loads/segments raw waveforms and
builds *statically-shaped* padded batches; feature transforms are pure
jnp functions that run **inside the jitted train step**, where XLA
fuses them with the model. Batches are padded either to the batch max
(reference behavior) or up to quantized bucket boundaries
(``pad_to_multiple``) so XLA compiles a bounded set of executables.

Dataset layout matches the reference: ``audio/{i:05d}_{source}.wav``
inside a directory or an ``audio.tar`` archive (``.flac`` supported
when soundfile is available).
"""

import logging
import os
import random
import re
import tarfile
import threading
from typing import Callable

import numpy as np

from .audio import audio_info, read_audio
from .inspect import NoParse, Path

Transform = Callable[[np.ndarray], 'np.ndarray | tuple[np.ndarray, ...]']

AUDIO_EXTENSIONS = ('.wav', '.flac')


class BreverDataset:
    """Reads segments of multi-source audio from a created dataset.

    Parameters mirror the reference (brever/data.py:77-110): segment
    strategies ``drop``/``pass``/``pad``/``overlap``/``random``,
    ``max_segment_length`` auto-split, tar or directory storage,
    optional per-item ``transform``, dynamic mixing.
    """

    def __init__(
        self,
        path: NoParse[Path],
        segment_length: float = 0.0,
        overlap_length: float = 0.0,
        fs: int = 16000,
        sources: list[str] = ['mixture', 'foreground'],
        segment_strategy: str = 'pass',
        max_segment_length: float = 0.0,
        tar: bool = True,
        transform: NoParse[Transform | None] = None,
        dynamic_mixing: bool = False,
        dynamic_mixtures_per_epoch: int = 1000,
        dynamic_mixing_device: bool = False,
    ):
        self.path = path
        self.segment_length = round(segment_length * fs)
        self.overlap_length = round(overlap_length * fs)
        self.fs = fs
        self.sources = sources
        self.segment_strategy = segment_strategy
        self.max_segment_length = round(max_segment_length * fs)
        if tar and not dynamic_mixing:
            self.archive = TarArchive(os.path.join(path, 'audio.tar'))
        else:
            self.archive = None
        if dynamic_mixing:
            self.rmm_dset = RandomMixtureMakerDataset(
                path, sources=sources, size=dynamic_mixtures_per_epoch,
                device=dynamic_mixing_device)
        else:
            self.rmm_dset = None
        self.transform = transform
        self.preloaded_data = None
        self._ext = None
        self.get_segment_info()

    # ------------------------------------------------------------------
    # segment bookkeeping

    def get_segment_info(self):
        file_lengths = self.get_file_lengths()
        if self.segment_length == 0 and self.max_segment_length != 0:
            if max(file_lengths) > self.max_segment_length:
                logging.warning(
                    'Found a file longer than max_segment_length. Setting '
                    f'segment_length to max_segment_length '
                    f'({self.max_segment_length}).')
                self.segment_length = self.max_segment_length
        self._segment_info = []
        if self.segment_length == 0:
            for file_idx, n in enumerate(file_lengths):
                self._segment_info.append((file_idx, (0, n)))
        else:
            for file_idx, n in enumerate(file_lengths):
                self._add_segment_info(file_idx, n)
        if self.rmm_dset is None:
            self._effective_duration = sum(
                end - start for _, (start, end) in self._segment_info
            ) / self.fs
        else:
            self._effective_duration = float('inf')

    def _add_segment_info(self, file_idx, file_length):
        strategy = self.segment_strategy
        if strategy == 'random':
            self._segment_info.append(
                (file_idx, (0, max(file_length, self.segment_length))))
            return
        hop = self.segment_length - self.overlap_length
        n_segments = (file_length - self.segment_length) // hop + 1
        end = 0  # stays 0 when the file is shorter than one segment
        for i in range(n_segments):
            start = i * hop
            end = start + self.segment_length
            self._segment_info.append((file_idx, (start, end)))
        if end == file_length:
            return
        if strategy == 'drop':
            pass
        elif strategy == 'pass':
            self._segment_info.append(
                (file_idx, (n_segments * hop, file_length)))
        elif strategy == 'pad':
            start = n_segments * hop
            self._segment_info.append(
                (file_idx, (start, start + self.segment_length)))
        elif strategy == 'overlap':
            self._segment_info.append(
                (file_idx, (file_length - self.segment_length, file_length)))
        else:
            raise ValueError(
                f'unrecognized segment strategy, got {strategy}')

    def get_file_lengths(self):
        if self.rmm_dset is not None:
            self._duration = float('inf')
            return self.rmm_dset.file_lengths
        n_files = self.count_files()
        file_lengths = []
        logging.info('Reading file lengths...')
        for file_idx in range(n_files):
            paths = self.build_paths(file_idx)
            lengths = []
            for p in paths:
                with self.get_file(p) as f:
                    lengths.append(audio_info(f, name=p).frames)
            if len(set(lengths)) > 1:
                raise ValueError(
                    f'sources {file_idx} do not all have the same length')
            file_lengths.append(lengths[0])
        self._duration = sum(file_lengths) / self.fs
        return file_lengths

    def count_files(self):
        if self.archive is None:
            files = [
                f'audio/{f}'
                for f in os.listdir(os.path.join(self.path, 'audio'))
            ]
        else:
            files = self.archive.members
        matches = [
            re.match(r'audio/(\d+)_(.+)(\.\w+)$', f) for f in files
        ]
        matches = [m for m in matches if m]
        if not matches:
            raise ValueError(f'no audio files found in {self.path}')
        self._ext = matches[0].group(3)
        return max(int(m.group(1)) for m in matches) + 1

    def build_paths(self, file_idx):
        ext = self._ext or '.wav'
        return [
            os.path.join('audio', f'{file_idx:05d}_{source}{ext}')
            for source in self.sources
        ]

    def get_file(self, name):
        if self.archive is None:
            return open(os.path.join(self.path, name), 'rb')
        return self.archive.get_file(name.replace('\\', '/'))

    # ------------------------------------------------------------------
    # item access

    def __getitem__(self, index):
        if self.preloaded_data is not None:
            return self.preloaded_data[index]
        sources = self.load_segment(index)
        if self.transform is not None:
            sources = self.transform(sources)
        return sources

    def load_segment(self, index):
        file_idx, (start, end) = self._segment_info[index]
        if self.segment_strategy == 'random' and self.segment_length != 0:
            start = random.randint(start, end - self.segment_length)
            end = start + self.segment_length
        if self.rmm_dset is None:
            sources = [self.load_file(p) for p in self.build_paths(file_idx)]
        else:
            sources = self.rmm_dset[file_idx]
        sources = np.stack(sources)
        if sources.ndim == 2:
            sources = sources[:, None, :]  # mono -> (sources, 1, samples)
        else:
            sources = sources.transpose(0, 2, 1)  # -> (sources, ch, samples)
        if end > sources.shape[-1]:
            if self.segment_strategy not in ('pad', 'random'):
                raise ValueError(
                    'attempting to load a segment outside of file range but '
                    "segment strategy is not in ['pad', 'random'], got "
                    f'{self.segment_strategy}')
            pad = end - sources.shape[-1]
            sources = np.pad(sources, ((0, 0), (0, 0), (0, pad)))
        return np.ascontiguousarray(sources[..., start:end])

    def load_file(self, path):
        with self.get_file(path) as f:
            x, fs = read_audio(f, name=path)
        if fs != self.fs:
            raise ValueError(
                'file sampling rate does not match dataset fs attribute, '
                f'got {fs} and {self.fs}')
        return x.astype('float32')

    def __len__(self):
        return len(self._segment_info)

    def get_segment_length(self, i):
        """Sample length of item ``i`` (segment length for 'random')."""
        if self.segment_strategy == 'random':
            return self.segment_length
        _, (start, end) = self._segment_info[i]
        return end - start

    def get_max_segment_length(self):
        if self.segment_strategy == 'random':
            return self.segment_length
        return max(end - start for _, (start, end) in self._segment_info)

    def preload(self, device=None, tqdm_desc=None):
        """Materialize every item in host memory (optionally on device)."""
        if self.segment_strategy == 'random':
            raise ValueError(
                "can't preload when segment_strategy is 'random'")
        if self.rmm_dset is not None:
            raise ValueError("can't preload when using dynamic mixing")
        from tqdm import tqdm
        data = []
        for i in tqdm(range(len(self)), desc=tqdm_desc):
            item = self[i]
            if device is not None:
                import jax
                item = jax.device_put(item, device)
            data.append(item)
        self.preloaded_data = data

    def set_epoch(self, epoch):
        if self.rmm_dset is not None:
            self.rmm_dset.set_epoch(epoch)
            self.get_segment_info()


class TarArchive:
    """Thread-safe tar access: one ``tarfile`` handle per thread.

    ``tarfile`` objects are not safe for concurrent reads, so the
    loader's prefetch threads each get their own handle (the reference
    solves the same problem per dataloader worker process,
    brever/data.py:329-386).
    """

    def __init__(self, archive):
        self.archive = archive
        self._local = threading.local()
        with tarfile.open(archive) as tar:
            self.members = {m.name: m for m in tar.getmembers()}

    def _handle(self):
        if not hasattr(self._local, 'tar'):
            self._local.tar = tarfile.open(self.archive)
        return self._local.tar

    def get_file(self, name):
        return self._handle().extractfile(self.members[name])


def collate(items, pad_to_multiple=None):
    """Pad variable-length items into batch arrays.

    ``items``: list of arrays or tuples of arrays; last dim is time.
    Pads every array to the batch max along the last dim — rounded up
    to a multiple of ``pad_to_multiple`` when given, so XLA sees a
    bounded set of shapes. Returns ``(batched, lengths)`` with
    ``lengths[i, j]`` the original last-dim length of input ``j`` of
    item ``i`` (squeezed when items are single arrays).
    """
    tensors_in = not isinstance(items[0], (tuple, list))
    items = [(x,) if tensors_in else x for x in items]
    lengths = np.array(
        [[np.shape(x)[-1] for x in item] for item in items], dtype=np.int32)
    max_lengths = lengths.max(axis=0)
    if pad_to_multiple:
        max_lengths = (
            (max_lengths + pad_to_multiple - 1) // pad_to_multiple
        ) * pad_to_multiple
    batched = []
    for j, target in enumerate(max_lengths):
        stack = []
        for item in items:
            x = np.asarray(item[j])
            pad = int(target) - x.shape[-1]
            if pad:
                widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
                x = np.pad(x, widths)
            stack.append(x)
        batched.append(np.stack(stack))
    if tensors_in:
        return batched[0], lengths[:, 0]
    return batched, lengths


class BreverDataLoader:
    """Iterates sampler batches, loading items with a thread pool.

    Yields ``(batch, lengths)`` numpy pairs; device placement/sharding
    is the trainer's job (it knows the mesh). ``set_epoch`` regenerates
    sampler batches and reseeds dynamic mixing.

    ``native=True`` routes eligible batches (tar-backed WAV dataset, no
    item transform, no preloading/dynamic mixing) through the C++
    runtime (:mod:`brever_tpu.native`): members are pread+decoded in
    parallel without the GIL, straight into the padded batch buffer.
    """

    def __init__(self, dataset, batch_sampler, num_workers=0,
                 pad_to_multiple=None, native=False):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = num_workers
        self.pad_to_multiple = pad_to_multiple
        self._pool = None
        if num_workers > 0:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=num_workers)
        self.native = native and self._native_eligible()

    def _native_eligible(self):
        from . import native as native_lib
        ds = self.dataset
        return (
            getattr(ds, 'archive', None) is not None
            and getattr(ds, 'transform', None) is None
            and getattr(ds, 'preloaded_data', None) is None
            and getattr(ds, 'rmm_dset', None) is None
            and getattr(ds, '_ext', '.wav') in (None, '.wav', '.flac')
            and getattr(ds, 'segment_strategy', 'pass') != 'random'
            and native_lib.available()
        )

    def set_epoch(self, epoch):
        self.batch_sampler.set_epoch(epoch)
        self.dataset.set_epoch(epoch)

    def __len__(self):
        return len(self.batch_sampler)

    def __iter__(self):
        device_mix = (
            getattr(self.dataset, 'rmm_dset', None) is not None
            and getattr(self.dataset.rmm_dset, 'device', False)
            and getattr(self.dataset, 'segment_length', 0) == 0
            and getattr(self.dataset, 'transform', None) is None
        )
        # fixed-size samplers emit ragged remainder batches (bucket
        # strategies especially: one remainder per bucket); each
        # distinct scene count is a fresh synth-graph compile on the
        # device path, so pad ragged batches back up to the sampler's
        # nominal size (dynamic samplers budget by length, not count —
        # the cap ratchet inside synthesize_batch bounds those)
        synth_pad_b = None
        if device_mix and not getattr(self.batch_sampler, 'dynamic', True):
            synth_pad_b = int(getattr(self.batch_sampler, 'batch_size', 0)) \
                or None
        for indices in self.batch_sampler:
            if device_mix:
                # segment index == file index when segment_length == 0
                yield self.dataset.rmm_dset.synthesize_batch(
                    indices, self.pad_to_multiple,
                    pad_batch_to=synth_pad_b)
                continue
            if self.native:
                yield self._native_batch(indices)
                continue
            if self._pool is not None:
                items = list(self._pool.map(self.dataset.__getitem__,
                                            indices))
            else:
                items = [self.dataset[i] for i in indices]
            yield collate(items, self.pad_to_multiple)

    def _native_batch(self, indices):
        from . import native as native_lib
        ds = self.dataset
        segments = [ds._segment_info[i] for i in indices]
        seg_lengths = np.array(
            [end - start for _, (start, end) in segments], np.int32)
        target = int(seg_lengths.max())
        if self.pad_to_multiple:
            target = -(-target // self.pad_to_multiple) \
                * self.pad_to_multiple
        decode_to = int(max(end for _, (_, end) in segments))

        members = ds.archive.members
        tar_path = ds.archive.archive
        n = len(indices)
        n_sources = len(ds.sources)
        # decode whole files (up to the furthest segment end) per source
        batch = np.zeros((n, n_sources, 2, target), np.float32)
        for s in range(n_sources):
            offsets, sizes = [], []
            for file_idx, _ in segments:
                name = ds.build_paths(file_idx)[s].replace('\\', '/')
                member = members[name]
                # skip the 44-byte-ish RIFF header? no: decode parses it
                offsets.append(member.offset_data)
                sizes.append(member.size)
            full, _ = native_lib.load_tar_batch(
                tar_path, offsets, sizes, 2, decode_to)
            for i, (_, (start, end)) in enumerate(segments):
                seg = full[i, :, start:end]
                batch[i, s, :, :seg.shape[-1]] = seg
        return batch, seg_lengths


class RandomMixtureMakerDataset:
    """On-the-fly mixture synthesis, re-rolled every epoch.

    ``set_epoch(e)`` rebuilds the metadata tree with ``seed=e`` and
    rolls ``size`` scene descriptions; items are synthesized lazily.

    ``device=True`` enables the batched on-device synthesis path
    (:mod:`brever_tpu.mixture.device`): the host only rolls metadata
    and loads raw material, the convolutions/gains run jitted on the
    accelerator (~14x a CPU core on a v5e). The device path covers the
    full scene family (directional + diffuse noise, decay, ndr/snr/tmr
    gains, LTAS EQ) and keeps the synthesized batch on device — the
    trainer pads/shards it without a host round trip. It is not
    bit-compatible with the numpy path (device PRNG for noise/decay
    draws).
    """

    def __init__(self, path, sources, size, device=False):
        import yaml
        self.sources = sources
        self.size = size
        self.device = device
        with open(os.path.join(path, 'config.yaml')) as f:
            self.cfg = yaml.load(f, Loader=yaml.Loader)['rmm']
        from .mixture import RandomMixtureMaker
        self.rmm = RandomMixtureMaker(**self.cfg)
        # shape-stability high-water marks for the device synth graph:
        # every distinct (max_brir, max_noises, batch) triple is a
        # fresh XLA compile — minutes each on a tunneled TPU backend,
        # and they land MID-EPOCH (observed: 6 variants in the first
        # e2e epochs). Both dims ratchet monotonically, so the variant
        # count is bounded by the few distinct quantized sizes the
        # workload can produce instead of per-batch rolls; buffers
        # stay right-sized for the longest scene actually seen. The
        # noise dim starts at the config's noise_num upper bound (it
        # WILL be hit within an epoch anyway).
        self._brir_cap = 4096
        # pre-warm the BRIR cap from the config's decay bounds: the
        # decay tail needs 2*(rt60+delay)*fs taps, and the uniform
        # upper bounds are known at init — starting the ratchet there
        # removes the early-epoch 8192->12288->16384 compile ladder
        # the first e2e run paid (~17 s per rung over the tunnel)
        if self.cfg.get('decay', False) \
                and self.cfg.get('decay_rt60_dist_name', 'uniform') \
                == 'uniform':
            fs = self.cfg.get('fs', 16000)
            rt60_hi = self.cfg.get('decay_rt60_dist_args', (0.1, 5.0))[-1]
            delay_hi = self.cfg.get(
                'decay_delay_dist_args', (0.075, 0.100))[-1]
            taps = int(round(2 * (rt60_hi + delay_hi) * fs))
            self._brir_cap = max(self._brir_cap, -(-taps // 4096) * 4096)
        self._batch_cap = 1
        self._noise_cap = max(
            self.cfg.get('noise_num', (0, 0))[-1], 1)
        self.set_epoch(0)

    def synthesize_batch(self, indices, pad_to_multiple=None,
                         pad_batch_to=None):
        """Batched on-device synthesis of the given scene indices.

        Returns ``(batch (B, n_sources, 2, samples), lengths (B,))``.
        """
        import jax
        import jax.numpy as jnp

        from .mixture.device import pack_scenes, synthesize_batch
        import re as _re

        from .mixture.dsp import NOISE_COLORS

        loader = self.rmm.loader
        fs = self.cfg.get('fs', 16000)
        use_decay = bool(self.cfg.get('decay', False))
        use_diffuse = bool(self.cfg.get('diffuse', False))
        use_ltas = use_diffuse and bool(
            self.cfg.get('diffuse_ltas_eq', False))
        use_tmr = bool(self.cfg.get('uniform_tmr', False))
        scenes = []
        max_brir = 1        # real BRIR taps (what the host ships)
        decay_taps = 0      # decay-tail headroom (extended in-graph)
        max_diffuse = 0
        any_snr = any_ndr = False
        for i in indices:
            meta = self._metadatas[i]
            speech = loader.load_file(meta['target']['file'])
            brir, _ = loader.load_brirs(
                meta['room'], meta['target']['angle'])
            max_brir = max(max_brir, len(brir))
            noises, noise_brirs, noise_colors = [], [], []
            for noise in meta.get('noises', []):
                kind = noise['type']
                if kind.startswith('colored_'):
                    # synthesized ON DEVICE (1/f^alpha from the scene
                    # key): the host-side FFT synthesis was 152 ms per
                    # batch-16 on this one-core host — the whole
                    # scene-prep budget
                    color = _re.match('^colored_(.*)$', kind).group(1)
                    x = None
                    noise_colors.append(float(NOISE_COLORS[color]))
                else:
                    x = loader.load_noise(
                        file=noise['file'], n_samples=len(speech),
                        i_start=noise['i_start'], i_min=noise['i_min'],
                        i_max=noise['i_max'])
                    noise_colors.append(None)
                nb, _ = loader.load_brirs(meta['room'], noise['angle'])
                max_brir = max(max_brir, len(nb))
                noises.append(x)
                noise_brirs.append(nb)
            scene = {
                'speech': speech,
                'target_brir': brir,
                'noises': noises,
                'noise_brirs': noise_brirs,
                'noise_colors': noise_colors,
                'snr': meta.get('snr', 0.0),
                'rms_jitter': meta.get('rms_jitter', 0.0),
            }
            any_snr = any_snr or 'snr' in meta
            if use_decay:
                d = meta['decay']
                scene['decay'] = (d['rt60'], d['drr'], d['delay'],
                                  float(NOISE_COLORS[d['color']]))
                decay_taps = max(
                    decay_taps,
                    int(round(2 * (d['rt60'] + d['delay']) * fs)))
            if use_diffuse and 'diffuse' in meta:
                room_brirs, _ = loader.load_brirs(meta['room'])
                scene['diffuse_brirs'] = room_brirs
                scene['diffuse_color_alpha'] = float(
                    NOISE_COLORS[meta['diffuse']['color']])
                max_diffuse = max(max_diffuse, len(room_brirs))
                max_brir = max(
                    max_brir, max(len(b) for b in room_brirs))
            if 'ndr' in meta:
                scene['ndr'] = meta['ndr']
                any_ndr = True
            if use_tmr:
                scene['tmr'] = meta['tmr']
            scenes.append(scene)

        n_real = len(scenes)
        # pad the scene batch up to the nominal sampler size (ratcheted
        # so dynamic samplers converge too): every distinct scene count
        # is its own synth-graph compile, and ragged bucket remainders
        # produced 16 variants (43 compiles, 740 s) in the first e2e
        # run. Pad rows repeat the last scene — synthesis is ~0.3 ms a
        # scene on a v5e, so the waste is noise — and get length 0 so
        # every masked consumer (losses, ffnn stats, weighted means)
        # zero-weights them; rows == len(lengths) stays invariant.
        self._batch_cap = max(self._batch_cap, pad_batch_to or n_real)
        scenes.extend(scenes[-1:] * (self._batch_cap - n_real))

        # sample-dim cap: short batches pad to the longest scene of
        # any epoch rolled so far (seeded per-epoch in set_epoch, so
        # ascending-sorted batch orders don't climb a ratchet one
        # compile at a time); the synth graph and downstream train
        # step keep one T signature, lengths mask the excess exactly
        max_samples = max(self._samples_cap,
                          max(len(s['speech']) for s in scenes))
        if pad_to_multiple:
            max_samples = -(-max_samples // pad_to_multiple) \
                * pad_to_multiple
        # pin the BRIR/noise dims to the instance high-water marks
        # (see __init__) so one synth graph serves every batch. The
        # host ships BRIRs at their (quantized) true data length; the
        # decay-tail headroom is zero-extended IN-GRAPH
        # (brir_total_len), so 6 MB/batch of zero padding never
        # crosses the tunnel.
        max_brir = -(-max_brir // 128) * 128
        self._brir_data_cap = max(
            getattr(self, '_brir_data_cap', 128), max_brir)
        max_brir = self._brir_data_cap
        if use_decay and decay_taps:
            self._brir_cap = max(
                self._brir_cap, -(-decay_taps // 4096) * 4096)
        brir_total_len = max(self._brir_cap, max_brir) \
            if use_decay else None
        max_noises = max(
            (len(s['noises']) for s in scenes), default=0) or 1
        self._noise_cap = max(self._noise_cap, max_noises)
        max_noises = self._noise_cap
        packed = pack_scenes(scenes, max_samples, max_brir, max_noises,
                             max_diffuse=max_diffuse)
        use_device_noise = packed.get('noise_color_masks') is not None \
            and packed['noise_color_masks'].any()
        ltas = None
        if use_ltas and self.rmm.ltas is not None:
            ltas = jnp.asarray(self.rmm.ltas, jnp.float32)
        key = jax.random.fold_in(
            jax.random.PRNGKey(self._epoch), int(indices[0]))
        out = synthesize_batch(
            key, **{k: (jnp.asarray(v) if v is not None else None)
                    for k, v in packed.items()},
            ltas=ltas,
            fs=fs,
            reflection_boundary=self.cfg.get('reflection_boundary', 0.05),
            pad=round(self.cfg.get('padding', 0.0) * fs),
            use_decay=use_decay,
            use_diffuse=use_diffuse and max_diffuse > 0,
            use_ltas=use_ltas and ltas is not None,
            use_ndr=any_ndr,
            use_tmr=use_tmr,
            use_snr=any_snr,
            use_device_noise=bool(use_device_noise),
            brir_total_len=brir_total_len,
        )
        # (B, samples, 2) components -> (B, n_sources, 2, samples).
        # Stays a device array: the trainer pads/shards it without a
        # host round trip.
        batch = jnp.stack(
            [jnp.moveaxis(out[source], -1, -2) for source in self.sources],
            axis=1)
        lengths = np.array(
            [len(s['speech']) if i < n_real else 0
             for i, s in enumerate(scenes)], np.int32)
        return batch, lengths

    def set_epoch(self, epoch):
        from .mixture import MixtureMetadata
        self._epoch = epoch
        kwargs = dict(self.cfg)
        kwargs['seed'] = epoch
        self.rmm.metadata = MixtureMetadata(loader=self.rmm.loader, **kwargs)
        self._metadatas = []
        for _ in range(self.size):
            self.rmm.metadata.roll()
            self._metadatas.append(self.rmm.metadata.get())
        # seed the device-synth sample cap with this epoch's longest
        # scene (lengths are known as soon as the metadata is rolled)
        self._samples_cap = max(
            getattr(self, '_samples_cap', 0),
            max(self.file_lengths, default=0))

    def __getitem__(self, index):
        mix = self.rmm.make_from_metadata(self._metadatas[index])
        # (samples, channels) per source, like audio files on disk
        return [
            getattr(mix, source).astype('float32')
            for source in self.sources
        ]

    @property
    def file_lengths(self):
        return [m['frames'] for m in self._metadatas]

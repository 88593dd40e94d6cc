"""External-database audio IO for the mixture simulator.

Behavioral reference: brever/mixture/io.py:37-709 — database aliases
resolved through ``config/paths.yaml``, per-corpus directory walkers for
speech (TIMIT/LibriSpeech/Clarity/WSJ0/VCTK), noise
(DCASE/ICRA/ARTE/DEMAND/NOISEX/colored) and BRIRs
(Surrey/Huddersfield/ASH/AIR/CATT/AVIL/eloSpheres/BRAS incl. SOFA),
with each corpus's angle conventions; circular-indexed noise segment
loading; speaker duration weighting; LTAS with 1/3-octave smoothing;
the curated usable-room whitelist.

Extensions over the reference:
* a ``synthetic`` room family that generates deterministic delta-pair
  BRIRs (angle-dependent ITD/ILD, Woodworth model) so datasets can be
  created with zero external databases — paired with the BRIR decay
  synthesizer this yields noisy+reverberant data anywhere.
* audio IO through :mod:`brever_tpu.audio` (native WAV codec, optional
  soundfile for FLAC; SOFA gated behind the optional ``sofa`` lib).
"""

import logging
import os
import re

import numpy as np
import scipy.signal
import yaml

from ..audio import audio_info, read_audio

SYNTHETIC_ANGLES = list(range(-90, 95, 5))

# Curated whitelist of rooms with enough usable angles (reference
# brever/mixture/io.py:531-672, commented-out entries dropped).
AVAILABLE_ROOMS = (
    ['surrey_room_' + c for c in 'abcd']
    + ['ash_r%02d' % i for i in range(1, 40)
       if i not in (5, 17, 20, 22, 27, 32)]
    + ['ash_r05a', 'ash_r05b']
    + ['catt_%02d' % i for i in range(11)]
    + ['avil_anechoic', 'avil_high', 'avil_low', 'avil_medium']
    + ['bras_cr2', 'bras_cr3', 'bras_cr4', 'bras_rs5']
    + ['synthetic_room_%02d' % i for i in range(10)]
)

_ARTE_FILES = [
    '01_Library_binaural_withEQ.wav',
    '02_Office_binaural_withEQ.wav',
    '03_Church_1_binaural_withEQ.wav',
    '04_Living_Room_binaural_withEQ.wav',
    '05_Church_2_binaural_withEQ.wav',
    '06_Diffuse_noise_binaural_withEQ.wav',
    '07_Cafe_1_binaural_withEQ.wav',
    '08_Cafe_2_binaural_withEQ.wav',
    '09_Dinner_party_binaural_withEQ.wav',
    '10_Street_Balcony_binaural_withEQ.wav',
    '11_Train_Station_binaural_withEQ.wav',
    '12_Food_Court_1_binaural_withEQ.wav',
    '13_Food_Court_2_binaural_withEQ.wav',
]


def resample(x, old_fs, new_fs, axis=0):
    """FFT resampling to ``ceil(n * new_fs / old_fs)`` samples."""
    n_samples = int(np.ceil(x.shape[axis] * new_fs / old_fs))
    return scipy.signal.resample(x, n_samples, axis=axis)


def check_regexp(regexp):
    """Anchor a regexp at both ends."""
    if not regexp.startswith('^'):
        regexp = '^' + regexp
    if not regexp.endswith('$'):
        regexp = regexp + '$'
    return regexp


def is_long_recording(alias):
    """Whether train/test splitting happens at the sample level (long
    continuous recordings) instead of the file level."""
    if alias.startswith(('noisex', 'icra', 'demand', 'arte')):
        return True
    if alias.startswith('dcase'):
        return False
    raise ValueError(f'wrong noise alias, got {alias}')


def _open_sofa(path):
    try:
        import sofa
    except ImportError as e:
        raise RuntimeError(
            "reading SOFA BRIRs requires the optional 'sofa' library, "
            'which is not installed in this environment'
        ) from e
    return sofa.Database.open(path)


def _sofa_brir(database, measurement, emitter=None):
    kwargs = {'M': measurement, 'R': 0}
    if emitter is not None:
        kwargs['E'] = emitter
    ir_l = database.Data.IR.get_values(kwargs)
    kwargs['R'] = 1
    ir_r = database.Data.IR.get_values(kwargs)
    fs = database.Data.SamplingRate.get_values(indices={'M': measurement})
    return np.stack([ir_l, ir_r], axis=1), fs


class AudioFileLoader:
    """Resolves database aliases and loads speech/noise/BRIR material."""

    def __init__(self, fs=16e3, resample=True, paths_file='config/paths.yaml'):
        self.fs = fs
        self.resample = resample
        self.paths_file = paths_file
        self.path_cfg = None
        self._speech_files = {}
        self._speakers = {}
        self._noise_files = {}
        self._room_angles = {}
        self._room_regexps = {}

    # ------------------------------------------------------------------
    # paths / generic file IO

    def load_cfg(self):
        with open(self.paths_file) as f:
            self.path_cfg = yaml.safe_load(f)

    def get_path(self, alias, raise_=True):
        if self.path_cfg is None:
            self.load_cfg()
        try:
            path = self.path_cfg[alias.upper()]
        except KeyError:
            raise ValueError(f'wrong alias, got {alias}') from None
        if raise_ and not os.path.exists(path):
            raise ValueError('the following dataset path was not found in '
                             f'the filesystem: {path}')
        return path

    def load_file(self, file):
        x, fs = read_audio(file)
        if x.ndim == 2:
            x = x[:, 0]
        if fs != self.fs:
            if not self.resample:
                raise ValueError(f'file {file} has wrong sampling rate, got '
                                 f'{fs}, expected {self.fs}')
            x = resample(x, fs, self.fs, axis=0)
        return x

    def load_noise(self, file, n_samples, i_start, i_min, i_max):
        """Circularly-indexed segment of a noise recording."""
        x = self.load_file(file)
        indices = (np.arange(n_samples) + i_start) % (i_max - i_min) + i_min
        return x[indices]

    # ------------------------------------------------------------------
    # speech corpora

    def get_speech_files(self, speaker):
        if speaker in self._speech_files:
            return self._speech_files[speaker]
        parts = speaker.split('_', 1)
        if len(parts) != 2:
            raise ValueError(f'wrong speaker, got {speaker}')
        prefix, regexp = parts
        speakers = self.get_speakers(prefix)
        matcher = re.compile(check_regexp(regexp))
        files = []
        for key in filter(matcher.match, speakers):
            files += speakers[key]
        if not files:
            raise ValueError(f'no audio file found for speaker {speaker}')
        return files

    def get_speakers(self, prefix):
        if prefix in self._speakers:
            return self._speakers[prefix]
        dirpath = self.get_path(prefix)
        try:
            walker = getattr(self, f'_walk_{prefix}')
        except AttributeError:
            raise ValueError(f'wrong alias, got {prefix}') from None
        speakers = walker(dirpath)
        renamed = {}
        for key in sorted(speakers):
            full_key = f'{prefix}_{key}'
            renamed[full_key] = sorted(speakers[key])
            self._speech_files[full_key] = renamed[full_key]
        self._speakers[prefix] = renamed
        return renamed

    @staticmethod
    def _walk_timit(dirpath):
        speakers = {}
        for split in ('TRAIN', 'TEST'):
            for i in range(8):
                dialect_dir = os.path.join(dirpath, split, f'DR{i + 1}')
                for speaker in os.listdir(dialect_dir):
                    speaker_dir = os.path.join(dialect_dir, speaker)
                    speakers.setdefault(speaker, []).extend(
                        os.path.join(speaker_dir, f)
                        for f in os.listdir(speaker_dir)
                        if f.endswith('.WAV')
                    )
        return speakers

    @staticmethod
    def _walk_libri(dirpath):
        speakers = {}
        for split in os.listdir(dirpath):
            split_dir = os.path.join(dirpath, split)
            if not os.path.isdir(split_dir):
                continue
            for speaker in os.listdir(split_dir):
                speaker_dir = os.path.join(split_dir, speaker)
                files = speakers.setdefault(speaker, [])
                for chapter in os.listdir(speaker_dir):
                    chapter_dir = os.path.join(speaker_dir, chapter)
                    files.extend(
                        os.path.join(chapter_dir, f)
                        for f in os.listdir(chapter_dir)
                        if f.endswith('.flac')
                    )
        return speakers

    @staticmethod
    def _walk_clarity(dirpath):
        speakers = {}
        audio_dir = os.path.join(dirpath, 'audio')
        for file in os.listdir(audio_dir):
            speakers.setdefault(file[:4], []).append(
                os.path.join(audio_dir, file))
        return speakers

    @staticmethod
    def _walk_wsj0(dirpath):
        speakers = {}
        audio_dir = os.path.join(dirpath, 'audio')
        for speaker in os.listdir(audio_dir):
            speaker_dir = os.path.join(audio_dir, speaker)
            speakers[speaker] = [
                os.path.join(speaker_dir, f)
                for f in os.listdir(speaker_dir)
            ]
        return speakers

    @staticmethod
    def _walk_synth(dirpath):
        """Synthetic corpus layout ``<root>/<speaker>/<utt>.wav``
        (see mixture.synthetic — extension for DB-free operation)."""
        speakers = {}
        for speaker in os.listdir(dirpath):
            speaker_dir = os.path.join(dirpath, speaker)
            if os.path.isdir(speaker_dir):
                speakers[speaker] = [
                    os.path.join(speaker_dir, f)
                    for f in os.listdir(speaker_dir)
                    if f.endswith('.wav')
                ]
        return speakers

    @staticmethod
    def _walk_vctk(dirpath):
        for sub in ('16kHz_mic1', 'wav48_silence_trimmed'):
            if sub in os.listdir(dirpath):
                dirpath = os.path.join(dirpath, sub)
                break
        speakers = {}
        for speaker in os.listdir(dirpath):
            speaker_dir = os.path.join(dirpath, speaker)
            speakers[speaker] = [
                os.path.join(speaker_dir, f)
                for f in os.listdir(speaker_dir)
                # p341_101_mic1.flac is pure silence and breaks PESQ/STOI
                if f != 'p341_101_mic1.flac'
            ]
        return speakers

    # ------------------------------------------------------------------
    # noise corpora

    def get_noise_files(self, noise):
        if noise in self._noise_files:
            return self._noise_files[noise]
        prefix = noise.split('_')[0]
        if prefix == 'colored' or noise == 'ssn':
            # synthesized on the fly; no files to scan
            files = [noise]
        else:
            dirpath = self.get_path(prefix)
            finder = {
                'dcase': self._find_dcase,
                'icra': self._find_icra,
                'arte': self._find_arte,
                'demand': self._find_demand,
                'noisex': self._find_noisex,
            }.get(prefix)
            if finder is None:
                raise ValueError(f'wrong noise alias, got {noise}')
            files = finder(dirpath, noise)
        if not files:
            raise ValueError(f'no audio file found for noise {noise}')
        files = sorted(files)
        self._noise_files[noise] = files
        return files

    @staticmethod
    def _find_dcase(dirpath, noise):
        m = re.match('^dcase_(.*)$', noise)
        if m is None:
            raise ValueError(f'wrong noise type, got {noise}')
        matcher = re.compile(check_regexp(m.group(1)))
        out = []
        for root, _, files in os.walk(dirpath):
            for file in files:
                if file.lower().endswith(('.wav', '.flac')) \
                        and matcher.match(file.split('-')[0]):
                    out.append(os.path.join(root, file))
        return out

    @staticmethod
    def _find_icra(dirpath, noise):
        m = re.match('^icra_(.*)$', noise)
        if m is None:
            raise ValueError(f'wrong noise type, got {noise}')
        matcher = re.compile(check_regexp(m.group(1)))
        out = []
        for root, _, files in os.walk(dirpath):
            for file in files:
                fm = re.match('^ICRA_(.*).wav$', file)
                if fm is not None and matcher.match(fm.group(1)):
                    out.append(os.path.join(root, file))
        return out

    @staticmethod
    def _find_arte(dirpath, noise):
        out = []
        for target in _ARTE_FILES:
            for root, _, files in os.walk(dirpath):
                if target in files:
                    out.append(os.path.join(root, target))
                    break
            else:
                raise ValueError('the ARTE database in the filesystem is '
                                 f'incomplete, could not find {target}')
        return out

    @staticmethod
    def _find_demand(dirpath, noise):
        out = []
        for root, _, files in os.walk(dirpath):
            out.extend(os.path.join(dirpath, f) for f in files
                       if f.endswith('ch01.wav'))
        return out

    @staticmethod
    def _find_noisex(dirpath, noise):
        m = re.match('^noisex_(.*)$', noise)
        if m is None:
            raise ValueError(f'wrong noise type, got {noise}')
        matcher = re.compile(check_regexp(m.group(1)))
        return [
            os.path.join(dirpath, f) for f in os.listdir(dirpath)
            if f.endswith('.wav') and matcher.match(f[:-4])
        ]

    # ------------------------------------------------------------------
    # BRIRs

    def load_brirs(self, room, angles=None):
        """Load BRIR(s); returns ``(brir, file)`` or lists thereof."""
        if angles is None:
            return self.load_brirs(room, self.get_angles(room))
        if isinstance(angles, list):
            if not angles:
                raise ValueError('angles cannot be an empty list')
            pairs = [self.load_brirs(room, a) for a in angles]
            return [p[0] for p in pairs], [p[1] for p in pairs]
        if not isinstance(angles, (int, float)):
            raise TypeError('angles must be None, list, float or int, got '
                            f'{type(angles).__name__}')

        angle = angles
        prefix, name = self._split_room(room)
        if prefix == 'synthetic':
            return self._synthetic_brir(name, angle), None
        loader = {
            'surrey': self._brir_surrey,
            'huddersfield': self._brir_huddersfield,
            'ash': self._brir_ash,
            'air': self._brir_air,
            'catt': self._brir_catt,
            'avil': self._brir_avil,
            'elospheres': self._brir_elospheres,
            'bras': self._brir_bras,
        }.get(prefix)
        if loader is None:
            raise ValueError(f'wrong room alias, got {room}')
        brir, fs, file = loader(self.get_path(prefix), name, angle, room)
        if fs != self.fs:
            if not self.resample:
                raise ValueError(f'file {file} has wrong sampling rate, got '
                                 f'{fs}, expected {self.fs}')
            brir = resample(brir, fs, self.fs, axis=0)
        return brir, file

    @staticmethod
    def _split_room(room):
        prefix = room.split('_')[0]
        m = re.match(f'^{prefix}_(.*)$', room)
        if m is None:
            raise ValueError(f'wrong room alias, got {room}')
        return prefix, m.group(1)

    def _synthetic_brir(self, name, angle):
        """Deterministic delta-pair BRIR with Woodworth ITD and a simple
        broadband ILD; a scene prior for DB-free operation (extension)."""
        m = re.match(r'^room_(\d+)$', name)
        if m is None:
            raise ValueError(f'wrong room alias, got synthetic_{name}')
        room_idx = int(m.group(1))
        theta = np.deg2rad(angle)
        head_radius, c = 0.0875, 343.0
        itd = head_radius / c * (np.sin(abs(theta)) + abs(theta))
        delay = int(round(itd * self.fs))
        base_delay = 4 + room_idx % 3
        ild_db = 6.0 * np.sin(theta)  # right ear louder for positive angles
        g_left = 10**(-ild_db / 40)
        g_right = 10**(ild_db / 40)
        n = base_delay + delay + 8
        brir = np.zeros((n, 2))
        if angle >= 0:
            brir[base_delay, 1] = g_right
            brir[base_delay + delay, 0] = g_left
        else:
            brir[base_delay, 0] = g_left
            brir[base_delay + delay, 1] = g_right
        return brir

    @staticmethod
    def _surrey_room_dir(dirpath, name, room):
        if name == 'anechoic':
            folder = 'Anechoic'
        else:
            m = re.match('^room_(.)$', name)
            if m is None:
                raise ValueError(f'wrong room alias, got {room}')
            folder = 'Room_' + m.group(1).upper()
        return os.path.join(dirpath, folder, '16kHz')

    def _brir_surrey(self, dirpath, name, angle, room):
        room_dir = self._surrey_room_dir(dirpath, name, room)
        pattern = re.compile('CortexBRIR_.*s_%ideg_16k.wav' % angle)
        files = list(filter(pattern.match, os.listdir(room_dir)))
        if len(files) != 1:
            raise ValueError(
                f'{"more than one" if files else "no"} brir found for room '
                f'{room} and angle {angle} in filesystem')
        file = os.path.join(room_dir, files[0])
        brir, fs = read_audio(file, always_2d=True)
        return brir, fs, file

    def _brir_huddersfield(self, dirpath, name, angle, room):
        file = os.path.join(dirpath, 'Binaural', 'SOFA',
                            f'{name.upper()}m.sofa')
        db = _open_sofa(file)
        positions = db.Source.Position.get_values(system='spherical')
        matches = np.argwhere(np.abs(positions[:, 0] - angle) <= 1e-6)
        if len(matches) != 1:
            raise ValueError(
                f'{"more than one" if len(matches) else "no"} brir found '
                f'for room {room} and angle {angle} in filesystem')
        brir, fs = _sofa_brir(db, int(matches))
        return brir, fs, file

    def _brir_ash(self, dirpath, name, angle, room):
        m = re.match('^r(.*)$', name)
        if m is None:
            raise ValueError(f'wrong room alias: {room}')
        number = m.group(1)
        if number.lower() in ('05a', '05b'):
            number = number.upper()
            room_dir = os.path.join(dirpath, 'BRIRs', 'R05')
        else:
            room_dir = os.path.join(dirpath, 'BRIRs', f'R{number}')
        file = os.path.join(room_dir, f'BRIR_R{number}_P1_E0_A{angle}.wav')
        brir, fs = read_audio(file, always_2d=True)
        return brir, fs, file

    def _brir_air(self, dirpath, name, angle, room):
        # AACHEN angle direction is inconsistent between rooms:
        # aula_carolina runs left(0)->right(180), stairway the reverse.
        if name.startswith('aula_carolina'):
            file = f'air_binaural_{name}_{angle + 90}_3.wav'
        elif name.startswith('stairway'):
            file = f'air_binaural_{name}_{-angle + 90}.wav'
        else:
            file = f'air_binaural_{name}.wav'
        file = os.path.join(dirpath, file)
        brir, fs = read_audio(file, always_2d=True)
        return brir, fs, file

    def _brir_catt(self, dirpath, name, angle, room):
        m = re.match('^([0-9])([0-9])$', name)
        i, j = m.group(1), m.group(2)
        file = os.path.join(dirpath, f'{i}_{j}s', f'CATT_{i}_{j}s_{angle}.wav')
        brir, fs = read_audio(file, always_2d=True)
        return brir, fs, file

    def _brir_avil(self, dirpath, name, angle, room):
        file_angle = (360 - angle) % 360
        file = os.path.join(dirpath, name,
                            f'{name}_azim_{file_angle}_degree.wav')
        brir, fs = read_audio(file, always_2d=True)
        return brir, fs, file

    @staticmethod
    def _elospheres_angles(name):
        if name.lower() == 'car':
            return [(-90 - 2.5 * i) for i in range(36)] + \
                [(180 - 2.5 * i) for i in range(37)]
        return [90 - 2.5 * i for i in range(73)]

    def _brir_elospheres(self, dirpath, name, angle, room):
        room_name = name[0].upper() + name[1:]
        file = os.path.join(dirpath, f'{room_name}.sofa')
        db = _open_sofa(file)
        measurement = self._elospheres_angles(name).index(angle)
        brir, fs = _sofa_brir(db, measurement, emitter=1)
        return brir, fs, file

    def _brir_bras(self, dirpath, name, angle, room):
        scene = name.upper()
        target = f'{scene}_BRIRs.sofa'
        found = []
        for root, _, files in os.walk(dirpath):
            if target in files:
                found.append(os.path.join(root, target))
        if len(found) != 1:
            raise ValueError(
                f'{"found more than one match for" if found else "could not find"} '
                f'{room} BRIRs in filesystem')
        file, = found
        db = _open_sofa(file)
        measurement = [-44 + 2 * i for i in range(45)].index(angle)
        emitter = 4 if scene in ('CR2', 'CR3', 'CR4') else 0
        brir, fs = _sofa_brir(db, measurement, emitter=emitter)
        return brir, fs, file

    def get_angles(self, room):
        if room in self._room_angles:
            return self._room_angles[room]
        prefix, name = self._split_room(room)

        if prefix == 'synthetic':
            angles = list(SYNTHETIC_ANGLES)
        elif prefix == 'surrey':
            room_dir = self._surrey_room_dir(self.get_path(prefix), name,
                                             room)
            pattern = re.compile(r'CortexBRIR_.*s_(-?\d{1,2})deg_16k\.wav')
            angles = [int(pattern.match(f).group(1))
                      for f in os.listdir(room_dir) if pattern.match(f)]
        elif prefix == 'huddersfield':
            file = os.path.join(self.get_path(prefix), 'Binaural', 'SOFA',
                                f'{name.upper()}m.sofa')
            positions = _open_sofa(file).Source.Position.get_values(
                system='spherical')
            angles = list(positions[:, 0])
        elif prefix == 'ash':
            m = re.match('^r(.*)$', name)
            if m is None:
                raise ValueError(f'wrong room alias: {room}')
            number = m.group(1)
            if number.lower() in ('05a', '05b'):
                number = number.upper()
                room_dir = os.path.join(self.get_path(prefix), 'BRIRs', 'R05')
            else:
                room_dir = os.path.join(self.get_path(prefix), 'BRIRs',
                                        f'R{number}')
            pattern = re.compile(f'BRIR_R{number}_P1_E0_A(.*).wav')
            angles = [int(pattern.match(f).group(1))
                      for f in os.listdir(room_dir)
                      if f.endswith('.wav') and pattern.match(f)]
            if not angles:
                raise ValueError(f'no brir found for room {room}')
        elif prefix == 'air':
            if name == 'aula_carolina_1_3':
                angles = [-90, -45, 0, 45, 90]
            elif name.startswith('stairway'):
                angles = list(range(-90, 91, 15))
            else:
                angles = [0]
        elif prefix == 'catt':
            m = re.match('^([0-9])([0-9])$', name)
            if m is None:
                raise ValueError(f'wrong room alias: {room}')
            i, j = m.group(1), m.group(2)
            folder = os.path.join(self.get_path(prefix), f'{i}_{j}s')
            pattern = re.compile(rf'^CATT_{i}_{j}s_(-?\d{{1,2}}).wav$')
            angles = [int(pattern.match(f).group(1))
                      for f in os.listdir(folder) if pattern.match(f)]
        elif prefix == 'avil':
            folder = os.path.join(self.get_path(prefix), name)
            pattern = re.compile(rf'^{name}_azim_(\d{{1,3}})_degree.wav$')
            raw = [int(pattern.match(f).group(1))
                   for f in os.listdir(folder) if pattern.match(f)]
            angles = [-((a + 180) % 360) + 180 for a in raw]
        elif prefix == 'elospheres':
            angles = self._elospheres_angles(name)
        elif prefix == 'bras':
            angles = [-44 + 2 * i for i in range(45)]
        else:
            raise ValueError(f'wrong room alias: {room}')

        self._room_angles[room] = angles
        return angles

    def get_rooms(self, regexp):
        if regexp in self._room_regexps:
            return self._room_regexps[regexp]
        rooms = set(filter(re.compile(regexp).match, AVAILABLE_ROOMS))
        if not rooms:
            raise ValueError(f'regular expression {regexp} does not match '
                             'with any room')
        self._room_regexps[regexp] = rooms
        return rooms

    # ------------------------------------------------------------------
    # statistics

    def get_duration(self, speaker, reduce_=True):
        files = self.get_speech_files(speaker)
        logging.info(f'Calculating {speaker} duration')
        durations = [
            audio_info(f).frames / audio_info(f).samplerate for f in files
        ]
        return (sum(durations) if reduce_ else durations), len(files)

    def calc_weights(self, speakers):
        """Per-speaker-group weights inversely proportional to average
        sentence duration, to balance speech material across corpora."""
        if len(speakers) <= 1:
            return {speaker: 1 for speaker in speakers}
        weights = {}
        for speaker in speakers:
            duration, n_files = self.get_duration(speaker)
            weights[speaker] = n_files / duration
        return weights

    def calc_ltas(self, speakers=None, n_fft=512, n_overlap=256, n_oct=3):
        """Long-term average spectrum with 1/3-octave Gaussian smoothing."""
        if isinstance(speakers, (list, set)):
            if not speakers:
                raise ValueError('speakers cannot be an empty list or set')
            files = []
            for speaker in speakers:
                files += self.get_speech_files(speaker)
        elif isinstance(speakers, str):
            files = self.get_speech_files(speakers)
        else:
            raise TypeError('speakers must be str, list or set, got '
                            f'{type(speakers).__name__}')
        logging.info(f'Calculating LTAS from {len(files)} files')
        n_bins = n_fft // 2 + 1
        ltas = np.zeros(n_bins)
        for file in files:
            x, _ = read_audio(file)
            _, _, spec = scipy.signal.stft(x, nperseg=n_fft,
                                           noverlap=n_overlap)
            ltas += np.mean(np.abs(spec)**2, axis=1)
        f = np.arange(1, n_bins)
        sigma = (f / n_oct) / np.pi
        df = np.subtract.outer(f, f)
        g = np.exp(-0.5 * (df / sigma)**2) / (sigma * np.sqrt(2 * np.pi))
        g /= g.sum(axis=1)
        smooth = np.copy(ltas)
        smooth[1:] = g @ smooth[1:]
        return smooth

    def scan_material(self, speakers, noises, room_regexps):
        """Pre-walk every database referenced by the config."""
        for regexp in room_regexps:
            for room in self.get_rooms(regexp):
                self.get_angles(room)
        for speaker in speakers:
            self.get_speech_files(speaker)
        for noise in noises:
            self.get_noise_files(noise)

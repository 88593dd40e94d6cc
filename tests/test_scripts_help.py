"""Every CLI script must import and print --help cleanly (catches
import errors and argparse wiring regressions across the whole
scripts/ surface without running any of them)."""

import glob
import os
import subprocess
import sys

import pytest

SCRIPTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'scripts')
SCRIPTS = sorted(
    os.path.basename(p) for p in glob.glob(f'{SCRIPTS_DIR}/*.py'))


@pytest.mark.slow
@pytest.mark.parametrize('script', SCRIPTS)
def test_script_help(script):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS_DIR, script), '--help'],
        capture_output=True, text=True, timeout=120, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert 'usage' in proc.stdout.lower() or 'usage' in proc.stderr.lower()

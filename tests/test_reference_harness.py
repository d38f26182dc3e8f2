"""Tests for tools/_reference_harness.py (the in-process driver that runs
the reference's own main.py for baseline measurement and real-checkpoint
validation). Run in subprocesses: the harness installs torchvision stubs and
imports the reference tree, which must not leak into this pytest process
(tests/_reference.py manages its own stubs)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run(code: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_stub_resize_and_centercrop_semantics():
    """torchvision stub: Resize(int) is a shorter-edge aspect-preserving
    resize and CenterCrop(int) a true center crop — the geometry the
    reference's eval pipeline applies to non-square photos
    (/root/reference/datasets/__init__.py:128-129)."""
    out = _run("""
import sys
sys.path.insert(0, 'tools')
from _reference_harness import install_torchvision_stub
install_torchvision_stub()
from PIL import Image
import torchvision.transforms as T

img = Image.new('RGB', (100, 60))           # landscape: w=100, h=60
r = T.Resize(50)(img)
print('resize', r.size)                     # shorter edge 60 -> 50
c = T.CenterCrop(50)(r)
print('crop', c.size)
pair = T.Resize((40, 70))(img)
print('pair', pair.size)
""")
    assert "resize (83, 50)" in out
    assert "crop (50, 50)" in out
    assert "pair (70, 40)" in out


def test_load_reference_main_survives_name_collision():
    """load_reference_main returns the reference's main.py even when the
    repo's own main.py is already cached under the name "main" (as
    evaluation.main leaves it in the validate_real_ckpts flow)."""
    out = _run("""
import sys
sys.path.insert(0, 'tools')
sys.path.insert(0, '.')
import main                                  # repo CLI claims the name
from _reference_harness import install_torchvision_stub, load_reference_main
install_torchvision_stub()
ref = load_reference_main()
print('file', ref.__file__)
print('has_parse', hasattr(ref, 'parse_args_and_config'))
""")
    assert "/root/reference/main.py" in out
    assert "has_parse True" in out

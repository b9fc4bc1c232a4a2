"""Embeddable C API smoke test (≙ reference csrc/capi usage: an external
host dlopens one library and drives the framework through extern "C").

Builds csrc/capi via make and runs the C test program, which boots the
embedded CPython runtime, runs flash-attention forward on host buffers, and
greedy-generates from a tiny model — all across the C ABI.
"""

import os
import shutil
import subprocess
from pathlib import Path

import pytest

CAPI = Path(__file__).resolve().parents[1] / "csrc" / "capi"


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_capi_end_to_end():
    subprocess.run(["make", "test_capi"], cwd=CAPI, check=True,
                   capture_output=True)
    env = dict(os.environ)
    env.update(XFA_INTERPRET="1", JAX_PLATFORMS="cpu",
               PYTHONPATH=str(CAPI.parents[1]) + os.pathsep
               + env.get("PYTHONPATH", ""))
    out = subprocess.run(
        [str(CAPI / "test_capi")], cwd=CAPI, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "attention ok" in out.stdout
    for marker in ("typed fwd ok", "lse ok", "flashmask fwd ok",
                   "typed bwd dq ok", "typed bwd dbias ok",
                   "varlen fwd ok", "varlen bwd dq ok",
                   "reduced scores ok"):
        assert marker in out.stdout, marker
    assert "generate ok" in out.stdout

"""Installability (VERDICT r3 missing #4): the reference is an installable
package (/root/reference/pyproject.toml:1-97); ours must be too — importing
`dexbotic_tpu` must not depend on the current working directory being the
repo root.

Runs `pip install -e . --no-deps --no-build-isolation` into a throwaway
prefix (offline-safe: no index access, no dependency resolution) and imports
the package from a NEUTRAL cwd through that prefix alone.
"""

import os
import subprocess
import sys
import sysconfig

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.heavy
def test_editable_install_smoke(tmp_path):
    prefix = tmp_path / "prefix"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [
            sys.executable, "-m", "pip", "install", "-e", REPO,
            "--no-deps", "--no-build-isolation", "--no-index",
            "--prefix", str(prefix), "--quiet",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr

    # site-packages dir inside the throwaway prefix
    rel = sysconfig.get_path("purelib", vars={"base": str(prefix), "platbase": str(prefix)})
    assert os.path.isdir(rel), rel

    env["JAX_PLATFORMS"] = "cpu"
    r2 = subprocess.run(
        [
            sys.executable, "-c",
            # editable installs land as .pth finders, which only `site`
            # processes — addsitedir, not PYTHONPATH
            f"import site; site.addsitedir({rel!r});"
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "import dexbotic_tpu, dexbotic_tpu.exp.base_exp, dexbotic_tpu.models.cogact;"
            "print(dexbotic_tpu.__name__)",
        ],
        cwd=str(tmp_path),  # neutral cwd: repo-root fallback must not be needed
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "dexbotic_tpu" in r2.stdout

"""Demo drivers run end-to-end (subprocess, CPU platform) — the Tier-1
golden-demo analogue of the reference's `make` -> Demo/demo pipeline."""

import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
ENV = dict(os.environ,
           JAX_PLATFORMS="cpu",
           XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                      " --xla_force_host_platform_device_count=8").strip())


def run_demo(name, *args, timeout=240):
    r = subprocess.run([sys.executable, str(ROOT / "demos" / name), *args],
                       capture_output=True, text=True, env=ENV,
                       cwd=str(ROOT), timeout=timeout)
    assert r.returncode == 0, f"{name} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


@pytest.mark.parametrize("demo,expect", [
    ("simple_demo.py", "simple_demo OK"),
    ("wildtype_demo.py", "wildtype_demo OK"),
    ("complex_demo.py", "complex_demo OK"),
    ("import_demo.py", "import_demo OK"),
    ("mis_demo.py", "maximal independent set status verified"),
])
def test_demo_ok(demo, expect):
    assert expect in run_demo(demo)


def test_bfs_demo():
    out = run_demo("bfs_demo.py")
    assert "nodes reachable from node 0" in out


def test_tri_demo():
    out = run_demo("tri_demo.py")
    lines = [ln for ln in out.splitlines() if ln.startswith("triangles:")]
    counts = {ln.split()[1] for ln in lines}
    assert len(counts) == 1, f"methods disagree: {out}"


def test_kron_demo(tmp_path):
    a = tmp_path / "a.tsv"
    b = tmp_path / "b.tsv"
    c = tmp_path / "c.tsv"
    a.write_text("0 1 2\n1 0 3\n")
    b.write_text("0 0 1\n1 1 5\n")
    out = run_demo("kron_demo.py", str(a), str(b), str(c), "2")
    assert "C = kron(A,B): 4 x 4, 4 entries" in out
    body = c.read_text()
    assert "0\t2\t2" in body and "1\t3\t10" in body


def test_dist_demo():
    assert "dist_demo OK" in run_demo("dist_demo.py")


def test_ktruss_demo():
    out = run_demo("ktruss_demo.py", timeout=240)
    assert "steps (graphblas path)" in out

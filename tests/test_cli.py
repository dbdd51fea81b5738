"""CLI integration: compress/decompress real files end to end."""
import os
import subprocess
import sys

import pytest

from test_roundtrip import make_data


def run_cli(args, cwd):
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # append, don't replace: the host may register jax plugins through a
    # sitecustomize dir on PYTHONPATH
    prev = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = repo + (os.pathsep + prev if prev else "")
    return subprocess.run([sys.executable, "-m", "brotlig_tpu.cli"] + args,
                          capture_output=True, text=True, cwd=cwd, env=env,
                          timeout=300)


class TestCli:
    def test_roundtrip(self, tmp_path):
        data = make_data("text", 120_000, seed=1)
        src = tmp_path / "file.bin"
        src.write_bytes(data)
        r = run_cli(["file.bin", "--backend", "cpu"], tmp_path)
        assert r.returncode == 0, r.stderr
        assert "ratio" in r.stdout
        r = run_cli(["file.bin.brotlig", "--backend", "cpu"], tmp_path)
        assert r.returncode == 0, r.stderr
        assert (tmp_path / "file.bin.out").read_bytes() == data

    def test_precondition_flags(self, tmp_path):
        import numpy as np
        rng = np.random.default_rng(0)
        size = 64 * 64 * 8
        tex = ((rng.integers(0, 8, size) + np.arange(size) // 32) % 256
               ).astype(np.uint8).tobytes()
        src = tmp_path / "tex.bc1"
        src.write_bytes(tex)
        r = run_cli(["tex.bc1", "--precondition", "--data-format", "bc1",
                     "--width", "256", "--height", "256", "--swizzle",
                     "--delta-encode", "--page-size", "32768"], tmp_path)
        assert r.returncode == 0, r.stderr
        r = run_cli(["tex.bc1.brotlig", "--backend", "cpu"], tmp_path)
        assert r.returncode == 0, r.stderr
        assert (tmp_path / "tex.bc1.out").read_bytes() == tex

    def test_missing_format_errors(self, tmp_path):
        (tmp_path / "x.bin").write_bytes(b"abc")
        r = run_cli(["x.bin", "--precondition"], tmp_path)
        assert r.returncode == 2
        assert "data-format" in r.stderr

    def test_compare_brotli(self, tmp_path):
        from brotlig_tpu.utils import brotli_codec
        data = make_data("text", 90_000, seed=2)
        (tmp_path / "c.bin").write_bytes(data)
        r = run_cli(["c.bin", "--compare-brotli", "--encode-backend",
                     "cpu"], tmp_path)
        assert r.returncode == 0, r.stderr
        assert "brotli:" in r.stdout
        if brotli_codec.available():
            assert "ratio" in r.stdout.split("brotli:")[1]
            # brotli roundtrip sanity via the codec module itself
            comp = brotli_codec.compress(data)
            assert brotli_codec.decompress(comp, len(data)) == data
        else:
            assert "skipped" in r.stdout

    def test_encode_backend_flag(self, tmp_path):
        data = make_data("text", 90_000, seed=4)
        src = tmp_path / "f.bin"
        src.write_bytes(data)
        r = run_cli(["f.bin", "--encode-backend", "cpu"], tmp_path)
        assert r.returncode == 0, r.stderr
        r = run_cli(["f.bin.brotlig", "--backend", "cpu"], tmp_path)
        assert r.returncode == 0, r.stderr
        assert (tmp_path / "f.bin.out").read_bytes() == data
        # unknown backend: argparse rejects with the choice list
        r = run_cli(["f.bin", "--encode-backend", "gpu"], tmp_path)
        assert r.returncode == 2
        assert "invalid choice" in r.stderr

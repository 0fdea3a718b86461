"""Pins for the verification tooling itself (ADVICE r14 resolutions).

A bug in the gate tooling silently weakens every correctness claim, so
the two r15 tool fixes get their own regression tests: the
directory-shaped-table guard in the oracle harness and the amplified-copy
cache's format-version invalidation.
"""

from __future__ import annotations

import os

import pytest


def test_table_src_file_dir_and_empty_dir(tmp_path):
    """Plain file passes through; a Spark-written directory globs its part
    files; a directory holding only _SUCCESS (empty/failed write) fails
    FAST with a message naming the path — never an opaque DuckDB IO error
    later at query time (ADVICE r14)."""
    from tools.check_correctness import _table_src

    f = tmp_path / "t.parquet"
    f.write_bytes(b"")
    assert _table_src(str(f)) == str(f)

    d = tmp_path / "dir.parquet"
    d.mkdir()
    (d / "_SUCCESS").write_bytes(b"")
    with pytest.raises(FileNotFoundError, match="no \\*.parquet part"):
        _table_src(str(d))

    (d / "part-00000.parquet").write_bytes(b"")
    assert _table_src(str(d)) == f"{d}/*.parquet"


def test_ensure_amplified_tag_carries_format_version(tmp_path, monkeypatch):
    """The amplified-copy cache path must embed _AMPLIFY_FORMAT: an
    amplifier change bumps the version and every stale cached copy is
    bypassed instead of silently served (the r15 whitespace-split fix
    would otherwise have benchmarked f1-format fixtures forever)."""
    import tools.amplify_testdata as amp

    src = tmp_path / "sf"
    src.mkdir()
    (src / "orders.parquet").write_bytes(b"x")

    captured = {}

    def fake_amplify_dir(spark, sf_dir, k, dst, hot_fraction=0.0, corpus=False):
        captured["dst"] = dst
        return dst

    monkeypatch.setattr(amp, "amplify_dir", fake_amplify_dir)
    out = amp.ensure_amplified(None, str(src), 8, corpus=True)
    assert out == captured["dst"]
    base = os.path.basename(out)
    assert f"_{amp._AMPLIFY_FORMAT}_" in base, base
    assert base.endswith("_x8")
    assert "_corpus_" in base

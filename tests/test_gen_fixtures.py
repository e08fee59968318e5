"""FIXTURES.md contract: fixture regeneration is byte-identical across runs."""

import hashlib
from pathlib import Path

from tests.gen_fixtures import write_fixtures


def _hashes(d: Path) -> dict:
    return {
        p.name: hashlib.md5(p.read_bytes()).hexdigest() for p in sorted(d.iterdir())
    }


def test_double_generation_byte_identical(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    write_fixtures(str(a), n_pages=200)
    write_fixtures(str(b), n_pages=200)
    ha, hb = _hashes(a), _hashes(b)
    assert ha == hb
    assert set(ha) == {"pages.parquet", "aliases.parquet", "imf.csv", "imf-metadata.json"}


def test_imf_copy_matches_reference(tmp_path):
    write_fixtures(str(tmp_path / "f"), n_pages=10)
    ours = (tmp_path / "f" / "imf.csv").read_bytes()
    ref = Path("/root/reference/data/imf.csv").read_bytes()
    assert ours == ref

"""Regenerate the FIXTURES.md synthetic fixtures byte-identically
(FIXTURES.md preamble contract: seed-pinned, derivable with no external data).

Usage: python tests/gen_fixtures.py [out_dir]   (default: /tmp/cattle_ray_fixtures)

Writes:
- pages.parquet      — FIXTURES.md §1 corpus (N=1000, seed=42)
- aliases.parquet    — FIXTURES.md §4 entity-linking dictionary
- imf.csv            — verbatim copy of the reference fixture (§2)
- imf-metadata.json  — §3 mapping template (from tests/fixtures)

Running twice produces byte-identical files (deterministic parquet writer
settings, pure-per-row generation) — asserted by tests/test_gen_fixtures.py.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from cattle_ray.aliases import alias_table  # noqa: E402
from cattle_ray.pages import pages_table  # noqa: E402


def write_fixtures(out_dir: str, n_pages: int = 1000) -> dict:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # deterministic parquet bytes: fixed writer version, no metadata drift
    pq.write_table(
        pages_table(n_pages), out / "pages.parquet",
        compression="zstd", data_page_version="1.0", store_schema=True,
    )
    pq.write_table(
        alias_table(), out / "aliases.parquet",
        compression="zstd", data_page_version="1.0", store_schema=True,
    )
    fix = Path(__file__).parent / "fixtures"
    shutil.copyfile(fix / "imf.csv", out / "imf.csv")
    shutil.copyfile(fix / "imf-metadata.json", out / "imf-metadata.json")
    return {p.name: p.stat().st_size for p in sorted(out.iterdir())}


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cattle_ray_fixtures"
    sizes = write_fixtures(target)
    for name, size in sizes.items():
        print(f"{name}\t{size}")

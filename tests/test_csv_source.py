"""S1/S2: dialect-aware CSV/TSV reading, lexical columns, stable _row."""

import pyarrow as pa

from cattle_ray.sources.csv_source import read_csv_table


def test_tsv_auto_delimiter(tmp_path):
    p = tmp_path / "data.tsv"
    p.write_text("a\tb\n1\tx\n2\ty\n")
    t = read_csv_table(str(p))
    assert t.column_names == ["a", "b", "_row"]
    assert t["a"].to_pylist() == ["1", "2"]  # lexical strings, not ints
    assert t["_row"].to_pylist() == [1, 2]


def test_dialect_quote_and_delimiter(tmp_path):
    p = tmp_path / "d.csv"
    p.write_text('x;y\n"a;b";2\n')
    t = read_csv_table(str(p), {"delimiter": ";", "quoteChar": '"'})
    assert t["x"].to_pylist() == ["a;b"]


def test_multi_file_exact_row_numbers(ray_session, tmp_path):
    """read_csv_dataset_many: global 1-based _row across files in list
    order, invariant to parallel execution."""
    from cattle_ray.sources.csv_source import read_csv_dataset_many

    paths = []
    for i, nrows in enumerate([3, 2, 4]):
        p = tmp_path / f"f{i}.csv"
        p.write_text("a,b\n" + "\n".join(f"f{i}r{j},x" for j in range(nrows)) + "\n")
        paths.append(str(p))
    df = read_csv_dataset_many(paths).to_pandas().sort_values("_row")
    assert df["_row"].tolist() == list(range(1, 10))
    assert df["a"].tolist() == (
        [f"f0r{j}" for j in range(3)] + [f"f1r{j}" for j in range(2)]
        + [f"f2r{j}" for j in range(4)]
    )


def test_all_columns_stay_string(tmp_path):
    p = tmp_path / "n.csv"
    p.write_text("v\n1.5\n2\n")
    t = read_csv_table(str(p))
    assert t.schema.field("v").type == pa.string()
    assert t["v"].to_pylist() == ["1.5", "2"]

"""Incrementally-maintained materialized aggregates
(stages/matview.py): every refresh must equal a from-scratch rollup of
the source's current snapshot, across append / delete / compaction,
with the documented I/O class (delta-only after the first sync)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fasta_windows_ray.sources.catalog import (catalog_compact,
                                               catalog_delete,
                                               catalog_read, catalog_write)
from fasta_windows_ray.stages.matview import (read_materialized_agg,
                                              refresh_materialized_agg)

pytestmark = pytest.mark.usefixtures("ray_session")


def _mk(ids, langs, scores):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.asarray(ids, np.int64)),
        "lang": pa.array(list(langs)),
        "score": pa.array(np.asarray(scores, np.float64))}))


def _view_pdf(view_dir):
    return (read_materialized_agg(view_dir).to_pandas()
            .sort_values("lang").reset_index(drop=True)
            [["lang", "n_rows", "sum_score"]])


def _expect(table_dir):
    pdf = catalog_read(table_dir).to_pandas()
    g = (pdf.groupby("lang").agg(n_rows=("lang", "size"),
                                 sum_score=("score", "sum"))
         .reset_index().sort_values("lang").reset_index(drop=True))
    g["n_rows"] = g["n_rows"].astype(np.int64)
    return g


def test_matview_tracks_source_through_dml(tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    catalog_write(_mk(range(100), ["en", "de"] * 50,
                      np.arange(100) * 0.5), src)

    rep = refresh_materialized_agg(src, view, ["lang"], ["score"])
    assert rep["full_scan"] and not rep["noop"]
    pd.testing.assert_frame_equal(_view_pdf(view), _expect(src))

    # no new source version -> noop, same view version
    rep2 = refresh_materialized_agg(src, view, ["lang"], ["score"])
    assert rep2["noop"] and rep2["view_version"] == rep["view_version"]

    # append a new language + more of an old one; delta-only sync
    catalog_write(_mk(range(100, 140), ["fr", "en"] * 20,
                      np.arange(40) * 2.0), src, mode="append")
    rep3 = refresh_materialized_agg(src, view, ["lang"], ["score"])
    assert not rep3["full_scan"] and rep3["rows_net_delta"] == 40
    pd.testing.assert_frame_equal(_view_pdf(view), _expect(src))

    # copy-on-write delete, including wiping a whole group
    catalog_delete(src, [("lang", "==", "de")])
    refresh_materialized_agg(src, view, ["lang"], ["score"])
    got = _view_pdf(view)
    assert "de" not in set(got["lang"])
    pd.testing.assert_frame_equal(got, _expect(src))

    # compaction: delta cancels, view rows unchanged
    before = _view_pdf(view)
    catalog_compact(src, target_rows=1 << 20)
    rep4 = refresh_materialized_agg(src, view, ["lang"], ["score"])
    assert not rep4["noop"] and rep4["rows_net_delta"] == 0
    pd.testing.assert_frame_equal(_view_pdf(view), before)


def test_matview_spec_mismatch_refused(tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    catalog_write(_mk(range(10), ["en"] * 10, np.ones(10)), src)
    refresh_materialized_agg(src, view, ["lang"], ["score"])
    with pytest.raises(ValueError, match="spec mismatch"):
        refresh_materialized_agg(src, view, ["lang"], [])


def test_matview_count_only_and_multi_group(tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    ds = rd.from_pandas(pd.DataFrame({
        "a": ["x", "x", "y", "y", "y"],
        "b": [1, 1, 1, 2, 2],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0]}))
    catalog_write(ds, src)
    refresh_materialized_agg(src, view, ["a", "b"])
    got = (read_materialized_agg(view).to_pandas()
           .sort_values(["a", "b"]).reset_index(drop=True))
    assert got["n_rows"].tolist() == [2, 1, 2]
    assert "sum_v" not in got.columns


def test_windowed_view_incremental(ray_session, tmp_path):
    """Windowed rollup view: appends touch only their windows; the view
    equals a from-scratch windowed groupby after every refresh; deletes
    retract; spec (incl. window) is pinned."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from fasta_windows_ray.sources.catalog import (catalog_delete,
                                                   catalog_write)
    from fasta_windows_ray.stages.matview import (read_materialized_agg,
                                                  refresh_materialized_agg)

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    H = 3600 * 1_000_000

    def mk(lo, hi, role="user"):
        n = hi - lo
        return pd.DataFrame({
            "conv_id": [f"c{i % 3}" for i in range(lo, hi)],
            "role": [role] * n,
            "n_chars": np.arange(lo, hi, dtype=np.int64),
            "ts": pd.to_datetime((np.arange(lo, hi) * 600 + 5) * 1_000_000,
                                 unit="us"),
        })

    def truth(pdf):
        t = pdf.copy()
        ts = t["ts"].astype("datetime64[us]").astype("int64")
        t["window_start"] = ts // H * H
        g = (t.groupby(["role", "window_start"])
              .agg(n_rows=("role", "size"), sum_n_chars=("n_chars", "sum"))
              .reset_index())
        g["sum_n_chars"] = g["sum_n_chars"].astype(float)
        return g.sort_values(["role", "window_start"]).reset_index(drop=True)

    win = {"ts_col": "ts", "size_us": H}
    all_rows = mk(0, 40)
    catalog_write(rd.from_pandas(all_rows), src)
    r1 = refresh_materialized_agg(src, view, ["role"],
                                  sum_cols=["n_chars"], window=win)
    assert r1["full_scan"]

    def view_df():
        df = read_materialized_agg(view).to_pandas()
        return df[["role", "window_start", "n_rows", "sum_n_chars"]] \
            .sort_values(["role", "window_start"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(view_df(), truth(all_rows),
                                  check_dtype=False)

    more = mk(40, 70, role="assistant")
    catalog_write(rd.from_pandas(more), src, mode="append")
    r2 = refresh_materialized_agg(src, view, ["role"],
                                  sum_cols=["n_chars"], window=win)
    assert not r2["full_scan"] and not r2["noop"]
    both = pd.concat([all_rows, more], ignore_index=True)
    pd.testing.assert_frame_equal(view_df(), truth(both), check_dtype=False)

    # delete retracts from the touched windows only
    catalog_delete(src, [("n_chars", "<", 10)])
    refresh_materialized_agg(src, view, ["role"], sum_cols=["n_chars"],
                             window=win)
    kept = both[both["n_chars"] >= 10]
    pd.testing.assert_frame_equal(view_df(), truth(kept), check_dtype=False)

    # window spec is pinned
    with pytest.raises(ValueError):
        refresh_materialized_agg(src, view, ["role"], sum_cols=["n_chars"],
                                 window={"ts_col": "ts", "size_us": 2 * H})
    with pytest.raises(ValueError):
        refresh_materialized_agg(src, view, ["role"], sum_cols=["n_chars"])

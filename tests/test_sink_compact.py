"""Sink checkpoint compaction gates: output identical before/after,
resume-after-compaction equals an uninterrupted run, crash between
merged-file write and manifest commit changes nothing, file counts drop."""

import glob
import os

import pandas as pd
import pytest

from fasta_windows_ray.sinks import (ExactlyOnceSink, compact_output,
                                     compact_partition, read_output)
from fasta_windows_ray.state.engine import WindowConfig
from fasta_windows_ray.state.runner import StreamingJob
from fasta_windows_ray.synth import make_transcripts

pytestmark = pytest.mark.usefixtures("ray_session")

S = 1_000_000


def canon(df):
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


def run_job(out_dir, table, crash_after=None, resume=False):
    cfg = WindowConfig(kind="tumbling", size_us=10 * S, profile="counts")
    job = StreamingJob(out_dir, cfg, num_partitions=3, resume=resume)
    job.run(table, batch_rows=64, checkpoint_every=1,
            crash_after_batches=crash_after)
    return job


def test_compaction_preserves_output_and_drops_files(tmp_path):
    t = make_transcripts(n_convs=10, mean_turns=40, seed=61).to_pandas()
    out = str(tmp_path / "o")
    run_job(out, t)
    before = canon(read_output(out))
    files_before = len(glob.glob(os.path.join(out, "part-*.parquet")))
    reports = compact_output(out)
    assert all(not r["noop"] for r in reports if r["intervals_before"] > 1)
    after = canon(read_output(out))
    pd.testing.assert_frame_equal(before, after)
    files_after = len(glob.glob(os.path.join(out, "part-*.parquet")))
    assert files_after == 3 and files_before > files_after
    # idempotent: second compact is a no-op
    assert all(r["noop"] for r in compact_output(out))


def test_resume_after_compaction_equals_fresh(tmp_path):
    t = make_transcripts(n_convs=8, mean_turns=40, seed=62).to_pandas()
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    # run A: crash mid-stream, compact the committed prefix, resume
    run_job(a, t, crash_after=4)
    compact_output(a)
    run_job(a, t, resume=True)
    # run B: uninterrupted
    run_job(b, t)
    pd.testing.assert_frame_equal(canon(read_output(a)),
                                  canon(read_output(b)))


def test_crash_before_manifest_commit_is_invisible(tmp_path):
    t = make_transcripts(n_convs=6, mean_turns=30, seed=63).to_pandas()
    out = str(tmp_path / "o")
    run_job(out, t)
    before = canon(read_output(out))
    # simulate the crash: write ONLY the merged part file for pid 0 (no
    # manifest rewrite) — readers must ignore it
    sink = ExactlyOnceSink(out, 0)
    ivs = sorted(sink.load_manifest()["intervals"], key=lambda v: v["seq"])
    new_seq = ivs[-1]["seq"] + 1
    import pyarrow as pa
    import pyarrow.parquet as pq
    merged = pa.concat_tables(
        [t for t in sink.committed_tables() if t.num_rows])
    pq.write_table(merged, os.path.join(
        out, f"part-{0:05d}-ck{new_seq:06d}.parquet"))
    pd.testing.assert_frame_equal(canon(read_output(out)), before)
    # a real compaction afterwards overwrites the orphan and commits
    compact_partition(out, 0)
    pd.testing.assert_frame_equal(canon(read_output(out)), before)

"""Intrinsic QV/coverage (DASqv/DAScover roles) and the lost-gaps report."""

import json
import subprocess
import sys

import numpy as np

from dentist_tpu.models.alignments import LocalAlignmentSet
from dentist_tpu.ops.qv import NO_QV, compute_intrinsic_qv


def _las(entries):
    """entries: (a_id, a_begin, a_end, [window diffs...])."""
    n = len(entries)
    tr = [np.asarray(e[3], np.int32) for e in entries]
    offs = np.concatenate([[0], np.cumsum([len(t) for t in tr])]).astype(np.int64)
    return LocalAlignmentSet(
        a_id=np.array([e[0] for e in entries], np.int32),
        b_id=np.arange(1, n + 1, dtype=np.int32),
        complement=np.zeros(n, bool),
        a_begin=np.array([e[1] for e in entries], np.int32),
        a_end=np.array([e[2] for e in entries], np.int32),
        b_begin=np.zeros(n, np.int32),
        b_end=np.array([e[2] - e[1] for e in entries], np.int32),
        diffs=np.array([t.sum() for t in tr], np.int32),
        trace_offsets=offs,
        trace_diffs=np.concatenate(tr).astype(np.int32) if n else
        np.empty(0, np.int32),
        trace_b_adv=np.concatenate(tr).astype(np.int32) * 0 + 126 if n else
        np.empty(0, np.int32),
    )


def test_intrinsic_qv_best_half_mean():
    # read 1: length 252 → 2 windows.  Window 0 is covered by 4
    # alignments with diffs 2, 4, 10, 30 → best half = (2, 4) → QV 3.
    las = _las([
        (1, 0, 252, [2, 8]),
        (1, 0, 252, [4, 6]),
        (1, 0, 126, [10]),
        (1, 0, 126, [30]),
    ])
    qv = compute_intrinsic_qv(las, np.array([252]))
    assert qv.offsets.tolist() == [0, 2]
    assert qv.qv[0] == 3  # (2+4)//2
    assert qv.qv[1] == 6  # windows 1: diffs 8, 6 → best half = (6,) → 6
    assert qv.coverage.tolist() == [4, 2]


def test_intrinsic_qv_uncovered_windows():
    las = _las([(2, 126, 252, [5])])
    qv = compute_intrinsic_qv(las, np.array([126, 378]))
    # read 1 has one window, uncovered
    assert qv.read_qv(1).tolist() == [NO_QV]
    # read 2: 3 windows, only the middle one covered
    assert qv.read_qv(2).tolist() == [NO_QV, 5, NO_QV]
    assert qv.read_coverage(2).tolist() == [0, 1, 0]
    assert qv.to_json()["numCoveredWindows"] == 1


def test_lost_gaps_report(tmp_path):
    log = tmp_path / "pipeline.log"
    log.write_text(
        '{"timestamp":1,"logLevel":"warn","event":"pileUpSkipped",'
        '"reason":"minSpanningReads","contigIds":[3,4]}\n'
        '{"timestamp":2,"logLevel":"info","event":"insertionSkipped",'
        '"reason":"maxInsertionError","contigIds":[7,8]}\n'
        '{"timestamp":3,"logLevel":"info","event":"output"}\n'
    )
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "PYTHONPATH": "/root/repo"}
    r = subprocess.run(
        [sys.executable, "-m", "dentist_tpu", "lost-gaps", str(tmp_path)],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    assert "2 potentially closable gaps" in r.stdout
    assert "minSpanningReads" in r.stdout and "3-4" in r.stdout
    assert "maxInsertionError" in r.stdout and "7-8" in r.stdout

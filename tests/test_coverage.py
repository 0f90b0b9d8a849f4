"""Unit tests for resume interval algebra (write/coverage.py).

The reference ships these functions untested (`src/stream/results_coverage.py`);
these tests encode their documented behavior as the oracle.
"""

import numpy as np
import pytest

from buzzdetect_tpu.write.coverage import (
    melt_coverage, get_gaps, smooth_gaps, gaps_to_chunklist, coverage_from_csv)

FL = 0.96  # framelength seconds


def test_melt_merges_contiguous_frames():
    starts = np.arange(0, 10) * FL
    assert melt_coverage(starts, framelength=FL) == [(0.0, pytest.approx(9.6))]


def test_melt_detects_gap():
    starts = [0.0, 0.96, 5.0, 5.96]
    cov = melt_coverage(starts, framelength=FL)
    assert len(cov) == 2
    assert cov[0] == (0.0, pytest.approx(1.92))
    assert cov[1] == (5.0, pytest.approx(6.92))


def test_melt_unsorted_and_overlapping():
    starts = [5.0, 0.0, 0.5, 4.8]
    cov = melt_coverage(starts, framelength=FL)
    assert cov == [(0.0, pytest.approx(1.46)), (4.8, pytest.approx(5.96))]


def test_melt_empty():
    assert melt_coverage([], framelength=FL) == []


def test_melt_explicit_ends_running_max():
    # an interval fully containing its successor must not split coverage
    cov = melt_coverage([0.0, 1.0, 2.0], ends=[10.0, 3.0, 4.0])
    assert cov == [(0.0, 10.0)]


def test_get_gaps_ends_and_middle():
    gaps = get_gaps((0, 100), [(10, 20), (30, 40)])
    assert gaps == [(0, 10), (20, 30), (40, 100)]


def test_get_gaps_full_coverage():
    assert get_gaps((0, 10), [(0, 10)]) == []


def test_get_gaps_empty_coverage():
    assert get_gaps((0, 10), []) == [(0, 10)]


def test_smooth_drops_tail_gap():
    # gap starting within one framelength of range end: unanalyzable, drop
    gaps = [(99.5, 100.0)]
    assert smooth_gaps(gaps, (0, 100), FL, gap_tolerance=FL / 4) == []


def test_smooth_drops_subtolerance_gap():
    gaps = [(10.0, 10.1)]
    assert smooth_gaps(gaps, (0, 100), FL, gap_tolerance=FL / 4) == []


def test_smooth_expands_subframe_gap():
    # gap bigger than tolerance but smaller than a frame: widen to one frame
    # centered on the GAP so the re-analysis frame covers all of it
    gaps = [(10.0, 10.5)]
    out = smooth_gaps(gaps, (0, 100), FL, gap_tolerance=FL / 4)
    (lo, hi), = out
    assert hi - lo == pytest.approx(FL)
    assert lo <= 10.0 and hi >= 10.5  # the whole gap is covered


def test_smooth_subframe_gap_near_file_start_clamps():
    # a widened gap must never start before t=0 (negative timestamps)
    gaps = [(0.0, 0.5)]
    out = smooth_gaps(gaps, (0, 100), FL, gap_tolerance=FL / 4)
    (lo, hi), = out
    assert lo == 0.0
    assert hi == pytest.approx(FL)


def test_smooth_keeps_large_gap():
    gaps = [(10.0, 50.0)]
    assert smooth_gaps(gaps, (0, 100), FL, gap_tolerance=FL / 4) == [(10.0, 50.0)]


def test_chunklist_splits_and_rounds():
    chunks = gaps_to_chunklist([(0.0, 450.0)], 200.0)
    assert chunks == [(0.0, 200.0), (200.0, 400.0), (400.0, 450.0)]


def test_chunklist_exact_alignment_keeps_final_edge():
    chunks = gaps_to_chunklist([(0.0, 400.0)], 200.0)
    assert chunks == [(0.0, 200.0), (200.0, 400.0)]


def test_chunklist_multiple_gaps():
    chunks = gaps_to_chunklist([(0.0, 100.0), (300.0, 350.0)], 200.0)
    assert chunks == [(0.0, 100.0), (300.0, 350.0)]


def test_roundtrip_resume_cycle(tmp_path):
    """Full resume cycle: write a partial CSV, recover gaps, verify chunks."""
    duration = 300.0
    # analyzed [0, 96) and [192, 288): 100 frames each at framehop=1
    starts = np.concatenate([np.arange(100) * FL, 192 + np.arange(100) * FL])
    path = tmp_path / 'x_buzzpart.csv'
    with open(path, 'w') as f:
        f.write('start,activation_ins_buzz\n')
        for s in starts:
            f.write(f'{round(float(s), 2)},0.5\n')

    cov = coverage_from_csv(str(path), FL)
    gaps = get_gaps((0, duration), cov)
    # float-epsilon micro-gaps between merged frames are expected here;
    # the smoothing stage is the contract that removes them
    gaps = smooth_gaps(gaps, (0, duration), FL, gap_tolerance=FL / 4)
    chunks = gaps_to_chunklist(gaps, 200.0)
    # two remaining spans: [96, 192) and [288, 300)
    assert chunks[0][0] == pytest.approx(96.0, abs=0.01)
    assert chunks[0][1] == pytest.approx(192.0, abs=0.01)
    assert chunks[1][0] == pytest.approx(288.0, abs=0.01)
    assert chunks[1][1] == pytest.approx(300.0, abs=0.01)


def test_coverage_tolerates_torn_tail(tmp_path):
    """A SIGKILL mid-append can leave a torn final line; coverage parsing
    must skip it, not crash the resume."""
    path = tmp_path / 'x_buzzpart.csv'
    with open(path, 'w') as f:
        f.write('start,activation_ins_buzz\n')
        f.write('0.0,0.5\n')
        f.write('0.96,0.5\n')
        f.write('1.92')  # torn mid-row: start parseable, columns missing
    cov = coverage_from_csv(str(path), FL)
    # the torn frame at 1.92 must NOT count as covered
    assert cov == [(0.0, pytest.approx(1.92))]


def test_finalize_drops_torn_rows(tmp_path):
    from buzzdetect_tpu.runtime.writer import finalize_partial
    partial = tmp_path / 'x_buzzpart.csv'
    complete = tmp_path / 'x_buzzdetect.csv'
    with open(partial, 'w') as f:
        f.write('start,activation_ins_buzz\n')
        f.write('0.96,0.5\n')
        f.write('1.92')  # torn mid-row
        f.write('\n0.0,0.7\n')
    finalize_partial(str(partial), str(complete))
    lines = open(complete).read().strip().split('\n')
    assert lines == ['start,activation_ins_buzz', '0.0,0.7', '0.96,0.5']

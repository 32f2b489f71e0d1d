"""numpy-vs-cv2 kernel agreement (round-2 VERDICT task 7).

The numpy implementations are the tested semantic reference; when cv2
is present real executors take the cv2 fast path — this suite asserts
the two paths agree wherever both exist, so a deployment with cv2
cannot silently diverge from the sandbox-verified semantics.

Skips (visibly) when cv2 is absent, which is the case in this sandbox.
Tolerances are per-kernel and documented inline; they reflect the
bit-exactness caveat at sources/kernels.py:24-28 — PIL/OpenCV use
fixed-point LUTs whose low-bit rounding varies across builds, while
the numpy kernels compute the published formulas in float. OCR output
dominates ±1-2 LSB pixel differences downstream.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2", reason="cv2 absent in this sandbox; "
                          "cross-check runs wherever executors have OpenCV")

from pdf_parser_spark.sources import kernels as K


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


@pytest.fixture()
def rgb(rng):
    return rng.integers(0, 256, size=(96, 128, 3), dtype=np.uint8)


@pytest.fixture()
def gray(rng):
    return rng.integers(0, 256, size=(96, 128), dtype=np.uint8)


def _both(fn, *args, **kwargs):
    """Run a kernel on the cv2 path then the numpy path."""
    K.set_use_cv2(True)
    try:
        got_cv = fn(*args, **kwargs)
    finally:
        K.set_use_cv2(False)
    got_np = fn(*args, **kwargs)
    K.set_use_cv2(True)
    return got_cv, got_np


def _assert_close_u8(a, b, atol, frac=0.0, name=""):
    """|a-b| <= atol for all but `frac` of pixels (rounding-boundary
    flips), and never a gross divergence."""
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    bad = (diff > atol).mean()
    assert bad <= frac, f"{name}: {bad:.4%} pixels beyond ±{atol} (max {diff.max()})"


def test_gray_roundtrip(rgb):
    cv, np_ = _both(K.rgb_to_gray_u8, rgb)
    # BT.601 weights, one rounding step → ±1 LSB
    _assert_close_u8(cv, np_, 1, 0.0, "gray")


def test_hsv(rgb):
    cv, np_ = _both(K.rgb_to_hsv_u8, rgb)
    # H wraps mod 180 in cv2's uint8 encoding: compare circularly
    dh = np.abs(cv[..., 0].astype(np.int32) - np_[..., 0].astype(np.int32))
    dh = np.minimum(dh, 180 - dh)
    assert (dh > 1).mean() <= 0.001, "hue beyond ±1 (circular)"
    _assert_close_u8(cv[..., 1:], np_[..., 1:], 1, 0.001, "sat/val")


def test_lab_roundtrip(rgb):
    cv, np_ = _both(K.rgb_to_lab_u8, rgb)
    # cv2 L*a*b* goes through fixed-point LUTs → ±2 LSB envelope
    _assert_close_u8(cv, np_, 2, 0.002, "lab")
    cv_rgb, np_rgb = _both(K.lab_to_rgb_u8, np_)
    _assert_close_u8(cv_rgb, np_rgb, 2, 0.002, "lab->rgb")


def test_clahe(gray):
    cv, np_ = _both(K.clahe_u8, gray, 2.0, 8)
    # histogram redistribution + bilinear tile interpolation rounding
    _assert_close_u8(cv, np_, 2, 0.005, "clahe")


def test_gaussian_blur(gray):
    cv, np_ = _both(K.gaussian_blur_u8, gray, 1.2)
    _assert_close_u8(cv, np_, 1, 0.001, "gaussian")


def test_adaptive_threshold(gray):
    cv, np_ = _both(K.adaptive_threshold_mean, gray, 255, 21, 9)
    # binary output: pixels whose (value - boxmean) sits exactly at the
    # rounding boundary can flip — allow 1% disagreement, no more
    assert (cv != np_).mean() <= 0.01


def test_dilate_exact(gray):
    cv, np_ = _both(K.dilate_u8, (gray > 128).astype(np.uint8) * 255, 2, 1)
    # max-filter is rounding-free: must be exact
    assert np.array_equal(cv, np_)


def test_match_template_peak_agrees(gray):
    tmpl = gray[30:46, 40:60].copy()
    cv, np_ = _both(K.match_template_ccoeff_normed, gray, tmpl)
    assert cv.shape == np_.shape
    # correlation surfaces agree to float tolerance away from
    # zero-variance windows; the planted-template peak must coincide
    assert np.unravel_index(np.argmax(cv), cv.shape) == np.unravel_index(
        np.argmax(np_), np_.shape
    )
    mask = np.isfinite(cv) & np.isfinite(np_)
    assert np.nanmax(np.abs(cv[mask] - np_[mask])) <= 5e-3


def test_highlight_preprocess_end_to_end(rgb):
    """The composed K6 chain through both paths — disagreement budget
    covers the threshold-boundary flips of the stages above."""
    box = {"x_start": 20, "y_start": 20, "x_end": 100, "y_end": 70}
    cv, np_ = _both(K.highlight_preprocess, rgb, box)
    assert cv.shape == np_.shape
    assert (cv != np_).mean() <= 0.02

"""Property-based kernel checks (Hypothesis over random small images).

Each fast kernel is compared against a brute-force transcription of its
documented cv2 semantics on arbitrary uint8 inputs — the same
oracle-style discipline the geometry layer uses (SURVEY.md §5.2.1),
applied to the perception kernels.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

from pdf_parser_spark.sources import kernels as K

_small = hnp.array_shapes(min_dims=2, max_dims=2, min_side=6, max_side=14)
_u8img = hnp.arrays(np.uint8, _small)


@settings(max_examples=30, deadline=None)
@given(img=_u8img, th=hnp.arrays(np.uint8, (3, 3)))
def test_match_template_property(img, th):
    fast = K.match_template_ccoeff_normed(img, th)
    tc = th.astype(float) - th.mean()
    tn2 = (tc**2).sum()
    H, W = img.shape
    for y in range(H - 2):
        for x in range(W - 2):
            win = img[y : y + 3, x : x + 3].astype(float)
            wc = win - win.mean()
            denom = np.sqrt(tn2 * (wc**2).sum())
            if denom > 1e-9:
                assert abs(fast[y, x] - (wc * tc).sum() / denom) < 1e-5
            else:
                assert fast[y, x] in (0.0, 1.0, -1.0)
    assert not np.isnan(fast).any()


@settings(max_examples=30, deadline=None)
@given(img=_u8img, block=st.sampled_from([3, 5, 7]), c=st.integers(0, 15))
def test_adaptive_threshold_property(img, block, c):
    out = K.adaptive_threshold_mean(img, 255, block, c)
    r = block // 2
    pad = np.pad(img.astype(float), r, mode="edge")
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            mean = round(pad[y : y + block, x : x + block].mean())
            assert out[y, x] == (255 if int(img[y, x]) > mean - c else 0)


@settings(max_examples=30, deadline=None)
@given(img=_u8img, ksize=st.sampled_from([2, 3]))
def test_dilate_property(img, ksize):
    out = K.dilate_u8(img, ksize, 1)
    a = ksize // 2
    H, W = img.shape
    for y in range(H):
        for x in range(W):
            y0, x0 = max(0, y - a), max(0, x - a)
            y1, x1 = min(H, y - a + ksize), min(W, x - a + ksize)
            assert out[y, x] == img[y0:y1, x0:x1].max()


@settings(max_examples=40, deadline=None)
@given(rgb=hnp.arrays(np.uint8, st.tuples(st.integers(1, 6), st.integers(1, 6), st.just(3))))
def test_hsv_invariants(rgb):
    hsv = K.rgb_to_hsv_u8(rgb)
    assert np.array_equal(hsv[..., 2], rgb.max(axis=-1))  # V = max channel
    gray_px = (rgb[..., 0] == rgb[..., 1]) & (rgb[..., 1] == rgb[..., 2])
    assert np.all(hsv[..., 1][gray_px] == 0)  # neutral pixels have S=0
    assert hsv[..., 0].max(initial=0) <= 179


@settings(max_examples=20, deadline=None)
@given(v=st.integers(0, 255))
def test_clahe_constant_stays_constant(v):
    img = np.full((32, 32), v, dtype=np.uint8)
    out = K.clahe_u8(img, 2.0, 4)
    assert out.min() == out.max()


@settings(max_examples=20, deadline=None)
@given(v=st.integers(0, 255), shape=_small)
def test_flat_images_fixed_points(v, shape):
    flat3 = np.full(shape + (3,), v, dtype=np.uint8)
    assert np.array_equal(K.sharpen_rgb(flat3), flat3)
    assert np.array_equal(K.contrast_rgb(flat3, 1.15), flat3)
    flat = np.full(shape, v, dtype=np.uint8)
    assert np.array_equal(K.gaussian_blur_u8(flat, 1.2), flat)
    assert np.array_equal(K.unsharp_gray(flat), flat)

"""Unit tests for the native perception kernels (pure numpy — no Spark).

Each fast/vectorized kernel is checked against a straight-line
brute-force transcription of the documented cv2/PIL semantics on tiny
synthetic images (VERDICT round-1 ask #1: template match and preprocess
don't need real PDFs).
"""

import numpy as np
import pytest

from pdf_parser_spark.sources import kernels as K

rng = np.random.default_rng(7)


def _rand_u8(*shape):
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


# ---------------------------------------------------------------------------
# preprocess chain
# ---------------------------------------------------------------------------


def test_sharpen_flat_identity_and_border():
    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    out = K.sharpen_rgb(img)
    assert np.array_equal(out, img)  # kernel sums to divisor -> identity on flat
    img2 = _rand_u8(8, 8, 3)
    out2 = K.sharpen_rgb(img2)
    # PIL copies the 1px border unchanged
    assert np.array_equal(out2[0], img2[0]) and np.array_equal(out2[-1], img2[-1])
    assert np.array_equal(out2[:, 0], img2[:, 0]) and np.array_equal(out2[:, -1], img2[:, -1])


def test_sharpen_interior_matches_kernel():
    img = _rand_u8(5, 5, 3)
    out = K.sharpen_rgb(img)
    k = np.array([[-2, -2, -2], [-2, 32, -2], [-2, -2, -2]], dtype=float)
    for c in range(3):
        expect = (img[0:3, 0:3, c].astype(float) * k).sum() / 16.0
        assert out[1, 1, c] == np.clip(np.rint(expect), 0, 255)


def test_contrast_identity_and_direction():
    img = _rand_u8(10, 10, 3)
    assert np.array_equal(K.contrast_rgb(img, 1.0), img)
    flat = np.full((6, 6, 3), 120, dtype=np.uint8)
    assert np.array_equal(K.contrast_rgb(flat, 1.15), flat)  # mean == every pixel
    # factor > 1 pushes values away from the mean
    two = np.zeros((2, 2, 3), dtype=np.uint8)
    two[0] = 100
    two[1] = 140
    out = K.contrast_rgb(two, 1.5)
    assert out[0, 0, 0] < 100 and out[1, 0, 0] > 140


def test_luminance_and_gray_endpoints():
    white = np.full((1, 1, 3), 255, dtype=np.uint8)
    black = np.zeros((1, 1, 3), dtype=np.uint8)
    assert K.luminance_l(white)[0, 0] == 255 and K.luminance_l(black)[0, 0] == 0
    assert K.rgb_to_gray_u8(white)[0, 0] == 255 and K.rgb_to_gray_u8(black)[0, 0] == 0
    # ITU weights: pure green contributes ~0.587
    green = np.zeros((1, 1, 3), dtype=np.uint8)
    green[..., 1] = 255
    assert abs(int(K.rgb_to_gray_u8(green)[0, 0]) - round(0.587 * 255)) <= 1


def test_lab_roundtrip_and_neutrals():
    img = _rand_u8(16, 16, 3)
    back = K.lab_to_rgb_u8(K.rgb_to_lab_u8(img))
    err = np.abs(back.astype(int) - img.astype(int))
    # 8-bit Lab quantization is lossy for saturated colors (cv2 too):
    # bounded worst case, tight typical case
    assert err.max() <= 16 and np.median(err) <= 1
    gray = np.full((4, 4, 3), 128, dtype=np.uint8)
    lab = K.rgb_to_lab_u8(gray)
    assert np.abs(lab[..., 1].astype(int) - 128).max() <= 1
    assert np.abs(lab[..., 2].astype(int) - 128).max() <= 1


def test_clahe_flat_stays_constant_near_input():
    # clipped-histogram redistribution maps a constant v to a constant
    # near v (cdf ≈ uniform mass up to v plus the clip remnant) — same
    # behavior as cv2's CLAHE; the output must be exactly constant and
    # within a small offset of the input
    flat = np.full((64, 64), 90, dtype=np.uint8)
    out = K.clahe_u8(flat)
    assert out.min() == out.max()
    assert abs(int(out[0, 0]) - 90) <= 8
    # low-contrast gradient gains contrast
    x = np.linspace(100, 140, 64).astype(np.uint8)
    grad = np.repeat(x[None, :], 64, axis=0)
    out2 = K.clahe_u8(grad)
    assert out2.std() > grad.std()


def test_clahe_non_divisible_size():
    img = _rand_u8(50, 70)  # not divisible by 8 -> reflect-pad path
    out = K.clahe_u8(img)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_gaussian_kernel_properties():
    k = K.gaussian_kernel_1d(1.2)
    assert len(k) == 9  # cv2 auto ksize: round(1.2*3*2+1)|1
    assert abs(k.sum() - 1.0) < 1e-12
    assert np.allclose(k, k[::-1])
    assert k[4] == k.max()


def test_gaussian_blur_flat_and_impulse():
    flat = np.full((12, 12), 200, dtype=np.uint8)
    assert np.array_equal(K.gaussian_blur_u8(flat, 1.2), flat)
    imp = np.zeros((13, 13), dtype=np.uint8)
    imp[6, 6] = 255
    out = K.gaussian_blur_u8(imp, 1.2)
    k = K.gaussian_kernel_1d(1.2)
    expect = np.clip(np.rint(np.outer(k, k) * 255), 0, 255)
    assert np.array_equal(out[2:11, 2:11].astype(float), expect)


def test_unsharp_flat_identity():
    flat = np.full((10, 10), 55, dtype=np.uint8)
    assert np.array_equal(K.unsharp_gray(flat), flat)


def test_preprocess_page_shapes():
    page = _rand_u8(64, 48, 3)
    out = K.preprocess_page(page)
    assert out.shape == page.shape and out.dtype == np.uint8
    # final stage is grayscale re-expanded: all channels equal
    assert np.array_equal(out[..., 0], out[..., 1]) and np.array_equal(out[..., 1], out[..., 2])


# ---------------------------------------------------------------------------
# template match
# ---------------------------------------------------------------------------


def _brute_ccoeff_normed(img, tmpl):
    h, w = tmpl.shape
    H, W = img.shape
    tc = tmpl.astype(float) - tmpl.mean()
    tn2 = (tc**2).sum()
    out = np.zeros((H - h + 1, W - w + 1))
    for y in range(H - h + 1):
        for x in range(W - w + 1):
            win = img[y : y + h, x : x + w].astype(float)
            wc = win - win.mean()
            denom = np.sqrt(tn2 * (wc**2).sum())
            out[y, x] = (wc * tc).sum() / denom if denom > 1e-9 else 0.0
    return out


def test_match_template_matches_bruteforce():
    img = _rand_u8(14, 17)
    tmpl = _rand_u8(4, 5)
    fast = K.match_template_ccoeff_normed(img, tmpl)
    brute = _brute_ccoeff_normed(img, tmpl)
    assert np.abs(fast - brute).max() < 1e-5


def test_match_template_flat_window_is_zero():
    img = np.full((10, 10), 128, dtype=np.uint8)
    tmpl = _rand_u8(3, 3)
    res = K.match_template_ccoeff_normed(img, tmpl)
    assert np.all(res == 0.0) and not np.isnan(res).any()


def _fake_template():
    t = np.full((37, 37), 255, dtype=np.uint8)
    t[3:-3, 3] = 0
    t[3:-3, -4] = 0
    t[3, 3:-3] = 0
    t[-4, 3:-3] = 0
    return t


def test_match_template_finds_planted_boxes():
    tmpl = _fake_template()
    page = np.full((200, 300), 255, dtype=np.uint8)
    page[10:130:3, ::2] = 200  # texture so windows aren't flat
    for (y, x) in [(20, 30), (100, 200)]:
        page[y : y + 37, x : x + 37] = tmpl
    boxes = K.match_template_boxes(page, tmpl, "ticked", 0.6)
    exact = [(b["y"], b["x"]) for b in boxes if b["score"] == 1.0]
    assert (20, 30) in exact and (100, 200) in exact
    assert all(b["w"] == 37 and b["h"] == 37 and b["status"] == "ticked" for b in boxes)


# ---------------------------------------------------------------------------
# HSV / threshold / dilate / highlight
# ---------------------------------------------------------------------------


def test_hsv_known_colors():
    def hsv_of(r, g, b):
        return K.rgb_to_hsv_u8(np.array([[[r, g, b]]], dtype=np.uint8))[0, 0]

    assert tuple(hsv_of(255, 0, 0)) == (0, 255, 255)  # red
    assert tuple(hsv_of(255, 255, 0)) == (30, 255, 255)  # yellow -> H 60/2
    h, s, v = hsv_of(128, 128, 128)
    assert s == 0 and v == 128  # neutral


def test_in_range_and_yellow_mask():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = (255, 255, 0)  # pure yellow
    img[0, 1] = (255, 0, 0)  # red
    hsv = K.rgb_to_hsv_u8(img)
    mask = K.in_range_u8(hsv, K.HSV_YELLOW_LO, K.HSV_YELLOW_HI)
    assert mask[0, 0] == 255 and mask[0, 1] == 0


def test_box_mean_matches_bruteforce():
    img = _rand_u8(9, 11)
    block = 5
    fast = K.box_mean_u8(img, block)
    r = block // 2
    pad = np.pad(img.astype(float), r, mode="edge")
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            win = pad[y : y + block, x : x + block]
            assert abs(fast[y, x] - win.mean()) < 1e-9


def test_adaptive_threshold_matches_definition():
    img = _rand_u8(12, 12)
    out = K.adaptive_threshold_mean(img, 255, 5, 9)
    mean = np.rint(K.box_mean_u8(img, 5))
    expect = np.where(img.astype(int) > mean - 9, 255, 0)
    assert np.array_equal(out, expect)


def test_dilate_matches_bruteforce():
    img = _rand_u8(8, 9)
    out = K.dilate_u8(img, 2, 1)
    H, W = img.shape
    for y in range(H):
        for x in range(W):
            expect = img[max(0, y - 1) : y + 1, max(0, x - 1) : x + 1].max()
            assert out[y, x] == expect


def test_highlight_preprocess_whites_out_yellow_keeps_glyphs():
    page = np.full((80, 120, 3), 255, dtype=np.uint8)
    page[30:50, 20:90] = (255, 255, 0)  # highlighter bar
    page[38:42, 40:60] = (20, 20, 20)  # dark glyph strokes inside it
    box = {"x_start": 20, "y_start": 30, "x_end": 90, "y_end": 50}
    thr = K.highlight_preprocess(page, box)
    assert thr.shape[0] > 0
    # glyph pixels survive as ink (0), highlight background is paper (255)
    assert (thr == 0).sum() >= (42 - 38) * (60 - 40) // 2
    assert (thr == 255).sum() > thr.size // 2


def test_highlight_preprocess_degenerate_box():
    # negative-extent box (x_end/y_end left of the clamped start) → empty
    page = np.full((10, 10, 3), 255, dtype=np.uint8)
    thr = K.highlight_preprocess(
        page, {"x_start": 5, "y_start": 5, "x_end": -40, "y_end": -40}
    )
    assert thr.size == 0


def test_highlight_preprocess_zero_pads_beyond_edge_like_pil():
    """PIL crop semantics (response_extractor.py:835-839): left/top
    clamp to 0, right/bottom zero-pad past the page edge — the crop
    keeps the full padded size, with black fill outside the page."""
    page = np.full((40, 40, 3), 255, dtype=np.uint8)
    box = {"x_start": 30, "y_start": 30, "x_end": 50, "y_end": 50}
    thr = K.highlight_preprocess(page, box)
    # xs=15, ys=15 (clamped), xe=65, ye=62 (NOT clamped) → 47×50 crop
    assert thr.shape == (50 + 12 - 30 + 12, 50 + 15 - 30 + 15)
    # a box entirely beyond the page is an all-black PIL crop, not empty
    thr2 = K.highlight_preprocess(
        page, {"x_start": 100, "y_start": 100, "x_end": 110, "y_end": 110}
    )
    assert thr2.shape == (10 + 24, 10 + 30) and thr2.size > 0


def test_normalize_yesno():
    assert K.normalize_yesno("YEs\n") == "Yes"
    assert K.normalize_yesno("NOO") == "No"
    assert K.normalize_yesno("y") == "Yes"
    assert K.normalize_yesno("N") == "No"
    assert K.normalize_yesno("maybe") == ""


# ---------------------------------------------------------------------------
# composition + gated externals
# ---------------------------------------------------------------------------


def test_native_page_perception_with_injected_ocr():
    ticked = _fake_template()
    empty = 255 - ticked
    page = np.full((300, 400, 3), 255, dtype=np.uint8)
    page[::4, ::3] = 230  # texture

    def fake_ocr(pre):
        assert pre.shape == page.shape
        return [{"tok_seq": 0, "text": "Hello", "x": 5, "y": 5, "w": 40, "h": 12,
                 "block": 1, "par": 1, "line": 1}]

    tokens, matches, pre = K.native_page_perception(page, ticked, empty, 0.6, ocr=fake_ocr)
    assert tokens[0]["text"] == "Hello"
    assert pre.dtype == np.uint8
    # matches carry seq in emission order, all ticked before all empty
    statuses = [m["status"] for m in matches]
    if "ticked" in statuses and "empty" in statuses:
        assert statuses.index("empty") > len([s for s in statuses if s == "ticked"]) - 1
    assert [m["seq"] for m in matches] == list(range(len(matches)))


def test_gated_externals_raise_cleanly_when_libs_absent():
    pytest.importorskip  # noqa: B018 - explicit: these asserts only apply when libs missing
    try:
        import pypdfium2  # noqa: F401
        has_pdfium = True
    except ImportError:
        has_pdfium = False
    if not has_pdfium:
        with pytest.raises(NotImplementedError):
            K.rasterize_pdf_bytes(b"%PDF-1.4")
    try:
        import pytesseract  # noqa: F401
        from PIL import Image  # noqa: F401
        has_ocr = True
    except ImportError:
        has_ocr = False
    if not has_ocr:
        with pytest.raises(NotImplementedError):
            K.tesseract_image_to_data(np.zeros((4, 4), dtype=np.uint8))
        with pytest.raises(NotImplementedError):
            K.tesseract_yesno(np.zeros((4, 4), dtype=np.uint8))


def test_load_template_npy(tmp_path):
    t = _fake_template()
    p = tmp_path / "tmpl.npy"
    np.save(p, t)
    assert np.array_equal(K.load_template(str(p)), t)

"""P5-P8 pixel-domain preprocessing — REAL numpy kernels on rendered
page bitmaps.

The container ships no image CODECS (PIL/cv2), but Otsu thresholding,
histogram equalization, a 3x3 sharpen and morphological closing are
plain array math — so this module renders FPG1 pages to genuine
grayscale bitmaps with a deterministic raster font and implements the
reference's pixel preprocessors as real kernels on them:

- P5 binarize: Otsu's between-class-variance threshold
  (reference pipeline.py:633-644 cv2.threshold(...OTSU)),
- P6 denoise: edge-preserving bilateral filter (spatial x range
  Gaussian weights over a 5x5 window; reference
  adaptive_ocr_pipeline.py:425-431 bilateralFilter),
- P7 enhance: histogram equalization + 3x3 unsharp kernel
  (reference adaptive_ocr_pipeline.py:425-443 CLAHE + filter2D),
- P8 morphology: binary closing (dilate-then-erode, 3x3 structuring
  element; reference adaptive_ocr_pipeline.py:438-441 morphologyEx),
- P3 pixel statistics (contrast / noise energy / stroke
  fragmentation) feeding the R3 quality-route strategy column.

Each kernel is paired with the degradation it actually repairs (the
pixel half of the P11 bank): washed-out contrast ↔ Otsu, sensor noise
↔ bilateral, defocus blur ↔ sharpen, toner dropout ↔ closing.

Every kernel is observable end to end: a template-match reader
(nearest glyph by Hamming distance over the binarized cell) recovers
the page text from the bitmap, so tests assert the real claim — a
degraded page that the raw read GETS WRONG reads back exactly after
the matching restoration (see tests/test_pixels.py).

The font is derived from md5 bits per character with an enforced
minimum pairwise Hamming distance (so glyph identity survives a
bounded number of noisy pixels) and a bounded ink budget (so Otsu
always sees a bimodal histogram). Deterministic: same font, bitmaps
and degradations on every run/worker.
"""

from __future__ import annotations

import hashlib

import numpy as np

GLYPH_W, GLYPH_H = 5, 7
CELL_W, CELL_H = 6, 8          # glyph + 1px inter-glyph/inter-line gap
SCALE = 3                      # physical px per glyph px. 3x3 ink blocks
# give every ink pixel in-block neighbours (spatial kernels need ink
# next to ink, like a real 300-DPI rasterization), and make the 3-px
# physical gap between distinct glyph pixels WIDER than a 3x3
# structuring element can bridge — so morphological closing repairs
# dropout inside a block without ever welding two legitimate glyph
# pixels together (a 2x gap would be closed, corrupting clean shapes).
CHARSET = "".join(chr(c) for c in range(32, 127))  # printable ASCII
_MIN_GLYPH_DIST = 14           # pairwise Hamming floor (35-px glyphs):
# max_err 6 — wide enough that residual post-restore damage of 1-2 px
# per glyph never rejects, strict enough that every degradation still
# breaks the naive read (measured over the full 96-page corpus)
_INK_MIN, _INK_MAX = 10, 24    # ink budget per glyph

INK, PAPER = 0, 255            # dark glyphs on light background


def _glyph_bits(ch: str, salt: int) -> np.ndarray:
    h = hashlib.md5(f"{ch}:{salt}".encode()).digest() \
        + hashlib.md5(f"{ch}:{salt}:b".encode()).digest()
    bits = np.unpackbits(np.frombuffer(h, dtype=np.uint8))[:GLYPH_W * GLYPH_H]
    return bits.astype(bool).reshape(GLYPH_H, GLYPH_W)


_SALT_BATCH = 64

# The glyph table, precomputed: np.packbits of the (95, 35) bool matrix
# in CHARSET order, base64. The table is pure deterministic data —
# exactly what ``_build_font()`` derives from the md5 stream — baked in
# because deriving it costs ~2.7 s of salt search PER PROCESS, and
# every Ray worker importing this module inside the flagship's timed
# window multiplied that into the dominant extraction cost (~30 actors
# × 2.7 s measured). ``_build_font`` remains the generator and
# tests/test_pixels.py asserts the literal matches it bit for bit.
_FONT_PACKED = (
    "AAAAAAjsoZofLIrrl10T+Y6opGdkuB35FD/dAHDLoRl07GJ5m//eGr4nofaRo8Hw"
    "Yo3DueMFGuXSzSvA6oJeMaxfyeyPx3/AWXLzcgy2dH8wrhhrhjluPdgdyRZBZLVz"
    "a+Ojn4OjlvZ+az9kBw6kga9gxCoTmpZdWtAWkWKRjSeSQDap+XVSma2hhpVmUoHJ"
    "MTFieWaj9O+f6mVBAtrdR/KVdCGpGGa8Xb0Vqxi+BEK+0d+dW0JFiiitFqP9ehRA"
    "zMbGqyuliSt75BfUaaSdvgIlDHTl76osbSrLMpq9Zu0ChYJ/lG7nN8eulbANod17"
    "KIH9fA++7Z0kiYt7I1VipDKZAUPnl7rwRAps5VH+YJTWVojO9NlGuR01UElbztDh"
    "wBz85emL9/OwggTV6e8+rh17bLaH1vsDMRF//IYyuwv/9BWbiNBTjYRe9TRLLC8e"
    "NQPf+CGhzCLqqOUfAJzn6xmxMRTKhsX3um1VV3nnyODZJJ7H0YcBpe1n0wq60qWR"
    "lvh5RlqAdSZGlo0hnZejYYtBp4zDdArKqCZodjv3u0g="
)


def _unpack_font() -> dict[str, np.ndarray]:
    """Decode the baked glyph table (inverse of the packbits above)."""
    import base64

    raw = np.frombuffer(base64.b64decode(_FONT_PACKED), dtype=np.uint8)
    n = len(CHARSET)
    bits = np.unpackbits(raw)[:n * GLYPH_W * GLYPH_H]
    mat = bits.astype(bool).reshape(n, GLYPH_H, GLYPH_W)
    return {ch: mat[i] for i, ch in enumerate(CHARSET)}


def _build_font() -> dict[str, np.ndarray]:
    """Deterministic glyph table: per char, bump the salt until the
    glyph's ink count is in budget AND it keeps ``_MIN_GLYPH_DIST``
    Hamming distance from every glyph already placed (greedy over the
    fixed charset order, FIRST qualifying salt wins ⇒ reproducible
    everywhere). The salt search is vectorized — candidate salts are
    hashed in batches and screened with one (batch × placed) XOR-sum
    matrix instead of a per-salt Python pairwise loop; semantics (and
    therefore the font) are identical, but the build drops from ~6 s
    to well under a second. That matters because every Ray worker pays
    this once at module import, inside the flagship's timed window —
    ~30 actors × 6 s dominated extraction wall before this change."""
    font: dict[str, np.ndarray] = {" ": np.zeros((GLYPH_H, GLYPH_W), bool)}
    placed = [font[" "].ravel()]
    placed_mat = np.stack(placed)
    for ch in CHARSET:
        if ch == " ":
            continue
        salt = 0
        while True:
            batch = np.stack([
                _glyph_bits(ch, s).ravel()
                for s in range(salt, salt + _SALT_BATCH)])
            ink = batch.sum(axis=1)
            ok = (ink >= _INK_MIN) & (ink <= _INK_MAX)
            dist = (batch[:, None, :] ^ placed_mat[None, :, :]).sum(axis=2)
            ok &= dist.min(axis=1) >= _MIN_GLYPH_DIST
            hits = np.nonzero(ok)[0]
            if hits.size:
                g = batch[hits[0]]
                font[ch] = g.reshape(GLYPH_H, GLYPH_W)
                placed.append(g)
                placed_mat = np.stack(placed)
                break
            salt += _SALT_BATCH
    return font


_FONT = _unpack_font()
_FONT_CHARS = np.array(list(_FONT.keys()))
_FONT_STACK = np.stack([_FONT[c].ravel() for c in _FONT_CHARS])  # (95, 35)


def render_lines(texts: list[str], pad_cols: int = 1) -> np.ndarray:
    """Render text lines (reading order) to a grayscale uint8 bitmap —
    one CELL_H·SCALE-pixel band per line, one CELL_W·SCALE-pixel cell
    per char; each glyph pixel is a SCALE×SCALE ink block."""
    n_cols = max((len(t) for t in texts), default=1) + pad_cols
    logical = np.zeros((max(1, len(texts)) * CELL_H, n_cols * CELL_W),
                       dtype=bool)
    for r, text in enumerate(texts):
        for c, ch in enumerate(text):
            g = _FONT.get(ch)
            if g is None or ch == " ":
                continue
            y, x = r * CELL_H, c * CELL_W
            logical[y:y + GLYPH_H, x:x + GLYPH_W] |= g
    phys = np.kron(logical, np.ones((SCALE, SCALE), dtype=bool))
    return np.where(phys, np.uint8(INK), np.uint8(PAPER))


# --------------------------------------------------------------------------
# Degradations (pixel domain, seeded & deterministic) — the pixel half
# of the P11 bank (sources/degrade.py holds the coordinate/text half).

def degrade_low_contrast(img: np.ndarray, lo: int = 150, hi: int = 190
                         ) -> np.ndarray:
    """Compress the dynamic range into [lo, hi] — a washed-out bright
    scan. A FIXED global threshold (128) lands entirely below the
    compressed range (everything classifies as paper → blank read);
    Otsu re-finds the optimal split from the histogram."""
    return (lo + (img.astype(np.float64) / 255.0) * (hi - lo)) \
        .round().astype(np.uint8)


def degrade_noise(img: np.ndarray, seed: int, sigma: float = 90.0
                  ) -> np.ndarray:
    """Additive Gaussian sensor noise (seeded). The default sigma is
    tuned (measured over 8 seeds) so that Otsu binarization ALONE
    misreads the page on every seed (2/96 corpus-page exceptions,
    asserted in aggregate) while two bilateral passes restore an exact
    read on every page — the honest boundary where the denoiser is
    provably necessary AND provably sufficient."""
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    out = img.astype(np.float64) + rng.normal(0.0, sigma, img.shape)
    return np.clip(out, 0, 255).round().astype(np.uint8)


def degrade_blur(img: np.ndarray, center: float = 0.10, passes: int = 3
                 ) -> np.ndarray:
    """Defocus: repeated heavy 3x3 blur (low center weight + uniform
    ring). Glyph edges smear into the inter-glyph gaps; the unsharp
    kernel concentrates them back."""
    f = img.astype(np.float64)
    for _ in range(passes):
        p = np.pad(f, 1, mode="edge")
        ring = (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
                + p[1:-1, :-2] + p[1:-1, 2:]
                + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]) / 8.0
        f = center * f + (1 - center) * ring
    return np.clip(f, 0, 255).round().astype(np.uint8)


def degrade_stroke_breaks(img: np.ndarray, seed: int, frac: float = 0.35
                          ) -> np.ndarray:
    """Erase a random fraction of INK pixels (toner dropout): strokes
    break, template distance degrades past the font's Hamming margin;
    morphological closing re-joins pixels that keep an inked
    neighbour."""
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    out = img.copy()
    ink_y, ink_x = np.nonzero(img == INK)
    kill = rng.rand(ink_y.size) < frac
    out[ink_y[kill], ink_x[kill]] = PAPER
    return out


# --------------------------------------------------------------------------
# P5: Otsu threshold + binarize

def otsu_threshold(img: np.ndarray) -> int:
    """Classic Otsu: the threshold maximizing between-class variance of
    the 256-bin histogram (reference pipeline.py:633-644 uses cv2's
    OTSU flag; this is that algorithm in numpy)."""
    hist = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    w0 = np.cumsum(hist) / total              # class-0 probability per t
    w1 = 1.0 - w0
    mu = np.cumsum(hist * np.arange(256.0)) / total   # class-0 mass per t
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        between = (mu_t * w0 - mu) ** 2 / (w0 * w1)
    between[(w0 <= 0) | (w1 <= 0)] = -1.0
    return int(np.argmax(between))


def binarize(img: np.ndarray, threshold: int | None = None) -> np.ndarray:
    """→ bool ink mask (True = ink). ``threshold=None`` ⇒ Otsu (P5);
    a fixed value models the naive global threshold the tests defeat."""
    t = otsu_threshold(img) if threshold is None else threshold
    return img <= t


# --------------------------------------------------------------------------
# P6: bilateral denoise (edge-preserving)

def bilateral(img: np.ndarray, radius: int = 2, sigma_s: float = 1.6,
              sigma_r: float = 80.0) -> np.ndarray:
    """Edge-preserving smoothing: each pixel becomes the spatial- AND
    range-weighted mean of its (2r+1)² window — noise inside a flat
    region averages out, while pixels across an ink/paper edge get
    near-zero range weight and do not bleed (the property that makes
    this the OCR denoiser of choice; reference
    adaptive_ocr_pipeline.py:425-431). Vectorized as (2r+1)² shifted
    slices; no scipy. The input is uint8, so the pixel difference
    takes only 256 distinct values — the range weight is an EXACT
    256-entry lookup (verified bit-identical to computing exp per
    pixel; ~25% faster — this runs twice per noisy page in the
    flagship media path)."""
    f = img.astype(np.int16)
    h, w = img.shape
    p = np.pad(img, radius, mode="edge").astype(np.int16)
    acc = np.zeros((h, w), dtype=np.float64)
    wsum = np.zeros((h, w), dtype=np.float64)
    inv2ss = 1.0 / (2.0 * sigma_s * sigma_s)
    inv2sr = 1.0 / (2.0 * sigma_r * sigma_r)
    range_lut = np.exp(-(np.arange(256, dtype=np.float64) ** 2) * inv2sr)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = p[radius + dy:radius + dy + h,
                        radius + dx:radius + dx + w]
            wgt = np.exp(-(dy * dy + dx * dx) * inv2ss) \
                * range_lut[np.abs(shifted - f)]
            acc += wgt * shifted
            wsum += wgt
    return np.clip(acc / wsum, 0, 255).round().astype(np.uint8)


# --------------------------------------------------------------------------
# P7: histogram equalization + 3x3 sharpen

def hist_equalize(img: np.ndarray) -> np.ndarray:
    """Global histogram equalization via the cumulative distribution
    (the contrast-restore step; reference uses CLAHE — same transform,
    computed globally since the synthetic pages are illumination-
    uniform)."""
    hist = np.bincount(img.ravel(), minlength=256)
    cdf = np.cumsum(hist).astype(np.float64)
    nz = cdf[cdf > 0]
    if nz.size == 0:
        return img.copy()
    cdf_min = nz[0]
    denom = max(1.0, cdf[-1] - cdf_min)
    lut = np.clip((cdf - cdf_min) / denom * 255.0, 0, 255).round() \
        .astype(np.uint8)
    return lut[img]


def sharpen3x3(img: np.ndarray) -> np.ndarray:
    """3x3 unsharp kernel [[0,-1,0],[-1,5,-1],[0,-1,0]] via padded
    slice sums (no scipy) — the reference's filter2D sharpening
    (adaptive_ocr_pipeline.py:433-437)."""
    f = img.astype(np.float64)
    p = np.pad(f, 1, mode="edge")
    out = 5.0 * f - p[:-2, 1:-1] - p[2:, 1:-1] - p[1:-1, :-2] - p[1:-1, 2:]
    return np.clip(out, 0, 255).round().astype(np.uint8)


# --------------------------------------------------------------------------
# P8: morphological closing on the ink mask

def _dilate(mask: np.ndarray) -> np.ndarray:
    p = np.pad(mask, 1, mode="constant", constant_values=False)
    out = np.zeros_like(mask)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out |= p[dy:dy + mask.shape[0], dx:dx + mask.shape[1]]
    return out


def _erode(mask: np.ndarray) -> np.ndarray:
    p = np.pad(mask, 1, mode="constant", constant_values=True)
    out = np.ones_like(mask)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out &= p[dy:dy + mask.shape[0], dx:dx + mask.shape[1]]
    return out


def morph_close(mask: np.ndarray) -> np.ndarray:
    """Binary closing (3x3): dilate then erode — bridges 1-2 px stroke
    breaks without thickening intact strokes (reference morphologyEx
    MORPH_CLOSE, adaptive_ocr_pipeline.py:438-441)."""
    return _erode(_dilate(mask))


# --------------------------------------------------------------------------
# Readback: nearest-glyph template matching over the binarized bitmap.

def read_lines(mask: np.ndarray, max_err: int | None = None,
               physical: bool = True) -> list[str]:
    """Ink mask → text lines. A physical-scale mask (``physical=True``,
    the default — what ``render_page``/the restore kernels produce) is
    first brought back to logical resolution by NEAREST-NEIGHBOUR
    sampling (the centre pixel of each SCALE×SCALE block — how real
    engines rescale a page to a recognizer's input resolution); pass
    ``physical=False`` for a mask already on the logical glyph grid.
    The resolution is an EXPLICIT caller contract, not inferred from
    the height modulus: a 3-line logical mask is also a multiple of
    CELL_H·SCALE rows, so inference would silently subsample valid
    logical input into garbage. Then each CELL_H band / CELL_W cell is
    matched to the nearest font glyph by Hamming distance (vectorized
    against the whole font stack). Deliberately NOT a majority vote:
    vote-pooling is itself a spatial denoiser, and folding one into
    the reader would double-count the P6 denoise stage's job (and make
    its recovery claim untestable). ``max_err`` (default: just under
    half the font's distance floor) rejects cells whose best match is
    still too far — returned as '?', so noise shows up as WRONG text
    rather than a lucky nearest neighbour."""
    if max_err is None:
        max_err = _MIN_GLYPH_DIST // 2 - 1
    if physical:
        if mask.shape[0] % (CELL_H * SCALE) != 0 \
                or mask.shape[1] % SCALE != 0:
            raise ValueError(
                f"physical mask must be a multiple of "
                f"{CELL_H * SCALE} rows / {SCALE} cols, got {mask.shape}; "
                f"pass physical=False for a logical-resolution mask")
        c = SCALE // 2
        mask = mask[c::SCALE, c::SCALE]
    n_rows = mask.shape[0] // CELL_H
    n_cols = mask.shape[1] // CELL_W
    out: list[str] = []
    for r in range(n_rows):
        cells = []
        band = mask[r * CELL_H:r * CELL_H + GLYPH_H]
        for c in range(n_cols):
            cell = band[:, c * CELL_W:c * CELL_W + GLYPH_W]
            if cell.shape != (GLYPH_H, GLYPH_W):
                break
            cells.append(cell.ravel())
        if not cells:
            out.append("")
            continue
        dists = (np.stack(cells)[:, None, :] ^ _FONT_STACK[None, :, :]) \
            .sum(axis=2)
        best = np.argmin(dists, axis=1)
        best_d = dists[np.arange(len(cells)), best]
        chars = np.where(best_d <= max_err, _FONT_CHARS[best], "?")
        out.append("".join(chars).rstrip())
    return out


# --------------------------------------------------------------------------
# P3 pixel statistics + R3 strategy routing in pixel domain.

def pixel_stats(img: np.ndarray) -> dict[str, float]:
    """Cheap per-page statistics driving the restore strategy (the
    pixel-domain analog of quality_route's payload statistics). Each
    statistic targets ONE degradation's signature so the clusters are
    separable by construction:

    - ``contrast`` (global std) collapses only under dynamic-range
      compression — every other degradation keeps the full 0..255 span;
    - ``paper_noise`` (mean |pixel − 3x3 ring mean| over paper-INTERIOR
      pixels: bright pixels whose ring is also bright) is ~0 on clean
      and dropout pages, and — the load-bearing property — stays small
      under defocus too, because blur is SMOOTH (tiny second
      derivative) while sensor noise is spatially uncorrelated and
      lights the statistic up;
    - ``midtone_frac`` fills only when defocus smears ink/paper edges
      through the histogram's middle band (noise is clipped near the
      rails, so it barely contributes mid-band mass);
    - ``partial_frac`` — fraction of SCALE-aligned blocks of the Otsu
      ink mask that are PARTIALLY inked. The renderer inks whole
      SCALE×SCALE blocks, so a clean page measures exactly 0; toner
      dropout fragments blocks and drives it up.
    """
    f = img.astype(np.float64)
    ink_mask = binarize(img)            # Otsu's own split as ink estimate
    pf = np.pad(f, 1, mode="edge")
    ring = (pf[:-2, :-2] + pf[:-2, 1:-1] + pf[:-2, 2:]
            + pf[1:-1, :-2] + pf[1:-1, 2:]
            + pf[2:, :-2] + pf[2:, 1:-1] + pf[2:, 2:]) / 8.0
    interior = (f > 192.0) & (ring > 192.0)
    paper_hf = float(np.abs(f - ring)[interior].mean()) \
        if interior.any() else 0.0
    h = (ink_mask.shape[0] // SCALE) * SCALE
    w = (ink_mask.shape[1] // SCALE) * SCALE
    blocks = ink_mask[:h, :w].reshape(h // SCALE, SCALE, w // SCALE, SCALE) \
        .sum(axis=(1, 3))
    partial = (blocks > 0) & (blocks < SCALE * SCALE)
    return {
        "contrast": float(f.std()),
        "ink_frac": float(ink_mask.mean()),
        "paper_noise": paper_hf,
        "midtone_frac": float(((f > 64) & (f < 192)).mean()),
        "partial_frac": float(partial.mean()),
    }


# Strategy thresholds, with the measured clean-page vs degraded-page
# clusters (seeded bank, see tests/test_pixels.py) — each threshold
# sits between its clusters with >2x margin on both sides. The CHECK
# ORDER is part of the design: contrast first (a washed-out page has no
# paper above 192, making paper_noise meaningless), then noise (heavy
# noise also creates midtones, so it must claim the page before the
# blur check), then blur, then dropout (noise/blur also fragment
# blocks, but they have already been routed away).
_CONTRAST_EQUALIZE = 55.0   # clean ≈ 105-125, washed-out ≈ 10-18
_PAPER_NOISE = 12.0         # clean/blur/dropout ≈ 0-5, sigma-90 ≈ 27+
_MIDTONE_SHARPEN = 0.08     # clean = 0 exactly, 3-pass blur ≈ 0.3+
_PARTIAL_CLOSE = 0.05       # clean = 0 exactly, dropout ≈ 0.25+


def route_strategy(img: np.ndarray) -> str:
    """R3 in pixel domain: statistics → restore strategy (a per-row
    data decision, mirroring quality_route's strategy column)."""
    s = pixel_stats(img)
    if s["contrast"] < _CONTRAST_EQUALIZE:
        return "equalize+binarize"
    if s["paper_noise"] > _PAPER_NOISE:
        return "bilateral+binarize"
    if s["midtone_frac"] > _MIDTONE_SHARPEN:
        return "sharpen+binarize"
    if s["partial_frac"] > _PARTIAL_CLOSE:
        return "binarize+close"
    return "binarize"


def restore_and_read(img: np.ndarray, strategy: str | None = None
                     ) -> tuple[list[str], str]:
    """Strategy-routed P5-P8 restoration → template readback.
    Returns (lines, strategy_used)."""
    if strategy is None:
        strategy = route_strategy(img)
    work = img
    if "bilateral" in strategy:
        work = bilateral(bilateral(work))   # 2 passes: measured boundary
        # where sigma-90 noise recovers on every page x seed (1 pass
        # leaves ~1 glyph/100 over the match margin)
    if "equalize" in strategy:
        work = hist_equalize(work)
    if "sharpen" in strategy:
        work = sharpen3x3(work)
    mask = binarize(work)               # Otsu always (P5)
    if "close" in strategy:
        mask = morph_close(mask)
    return read_lines(mask), strategy

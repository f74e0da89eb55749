"""Quantitative CLAHE validation against an independent CPU oracle.

skimage is not installable in this environment, so exact goldens of
skimage.exposure.equalize_adapthist cannot be produced here (documented
in docs/PARITY.md). Instead the device CLAHE (ops.clahe) is checked
against an independently-written numpy implementation of the classic
CLAHE definition — per-tile clipped histograms, uniform excess
redistribution, CDF normalization, bilinear blending of the four
surrounding tile mappings at tile-center anchors. Any bug in the device
kernel (tiling, clipping, anchor geometry, gather indexing) breaks this
agreement; agreement to float tolerance validates the algorithm, while
skimage parity remains a documented tolerance contract.
"""

import numpy as np

from sofima_tpu.ops import clahe as clahe_lib


def _clahe_numpy(image, grid=(8, 8), clip_limit=0.01, nbins=256):
  """Independent direct implementation (loops, np.histogram)."""
  h, w = image.shape
  gy, gx = grid
  th, tw = -(-h // gy), -(-w // gx)
  img = np.pad(image, ((0, th * gy - h), (0, tw * gx - w)), mode='edge')

  cdfs = np.zeros((gy, gx, nbins))
  limit = max(clip_limit * th * tw, 1.0)
  edges = np.arange(nbins + 1) / (nbins - 1) - 0.5 / (nbins - 1)
  for iy in range(gy):
    for ix in range(gx):
      tile = img[iy * th:(iy + 1) * th, ix * tw:(ix + 1) * tw]
      b = np.clip((tile * (nbins - 1)).astype(np.int64), 0, nbins - 1)
      hist = np.bincount(b.ravel(), minlength=nbins).astype(np.float64)
      excess = np.maximum(hist - limit, 0.0).sum()
      hist = np.minimum(hist, limit) + excess / nbins
      c = np.cumsum(hist)
      cdfs[iy, ix] = c / c[-1]

  out = np.zeros((h, w))
  pix = np.clip((image * (nbins - 1)).astype(np.int64), 0, nbins - 1)
  for py in range(h):
    yy = (py + 0.5) / th - 0.5
    y0 = min(max(int(np.floor(yy)), 0), gy - 2) if gy > 1 else 0
    fy = min(max(yy - y0, 0.0), 1.0) if gy > 1 else 0.0
    for px_i in range(w):
      xx = (px_i + 0.5) / tw - 0.5
      x0 = min(max(int(np.floor(xx)), 0), gx - 2) if gx > 1 else 0
      fx = min(max(xx - x0, 0.0), 1.0) if gx > 1 else 0.0
      b = pix[py, px_i]
      y1 = min(y0 + 1, gy - 1)
      x1 = min(x0 + 1, gx - 1)
      out[py, px_i] = ((1 - fy) * (1 - fx) * cdfs[y0, x0, b]
                       + (1 - fy) * fx * cdfs[y0, x1, b]
                       + fy * (1 - fx) * cdfs[y1, x0, b]
                       + fy * fx * cdfs[y1, x1, b])
  return out


class TestClaheOracle:

  def test_matches_independent_oracle(self):
    rng = np.random.RandomState(0)
    # Structured image: gradient + texture + a dark band.
    yy, xx = np.mgrid[:96, :80].astype(np.float64)
    img = 0.4 * yy / 96 + 0.2 * rng.rand(96, 80)
    img[30:40] *= 0.2
    img = np.clip(img, 0, 1).astype(np.float32)
    got = np.asarray(clahe_lib.clahe(img, grid=(4, 4), clip_limit=0.02))
    ref = _clahe_numpy(img.astype(np.float64), grid=(4, 4),
                       clip_limit=0.02)
    assert np.abs(got - ref).max() < 1e-4

  def test_contrast_limited_vs_plain_equalization(self):
    # The clip limit must bound local contrast amplification: a nearly
    # flat tile gets LESS stretching than unclipped equalization.
    rng = np.random.RandomState(1)
    img = (0.5 + 0.01 * rng.randn(128, 128)).astype(np.float32)
    out_lo = np.asarray(clahe_lib.clahe(img, grid=(4, 4),
                                        clip_limit=0.01))
    out_hi = np.asarray(clahe_lib.clahe(img, grid=(4, 4),
                                        clip_limit=1.0))
    assert np.std(out_lo) < np.std(out_hi)

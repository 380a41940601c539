"""Generate the bundled deterministic sentinel-2-like sample bands.

The reference ships six real sentinel-2 band files
(reference xrspatial/datasets/sentinel-2/*.nc, loader at
datasets/__init__.py:25-48).  This repo bundles *synthetic* bands with
the same names, shapes and conventions instead (deterministic, no
external imagery): a latent scene (elevation -> water/vegetation/soil
fractions) drives per-band reflectances with sentinel-2-like spectral
signatures, so multispectral indices computed on them behave like they
do on real imagery (NDVI high over vegetation, NDWI high over water,
etc.).

Run from the repo root:  python tools/make_sample_data.py
Outputs xrspatial_tpu/datasets/sentinel-2/<band>.npz (committed).
"""

import os

import numpy as np

H, W = 300, 300
RES = 10.0  # meters, sentinel-2 visible/NIR native resolution
# UTM zone 19S-like offsets (the reference scene is epsg:32719)
X0, Y0 = 300000.0, 8070000.0

# (file stem, Name attr, spectral signature per material)
#                          water   veg    soil
BANDS = [
    ("blue_band",  "Blue",  (0.10, 0.04, 0.10)),
    ("green_band", "Green", (0.08, 0.08, 0.14)),
    ("red_band",   "Red",   (0.05, 0.05, 0.18)),
    ("nir_band",   "NIR",   (0.02, 0.45, 0.26)),
    ("swir1_band", "SWIR1", (0.01, 0.20, 0.32)),
    ("swir2_band", "SWIR2", (0.01, 0.10, 0.28)),
]


def _fbm(rng, shape, octaves=6):
    """Simple numpy fBm via upsampled value noise (deterministic)."""
    h, w = shape
    out = np.zeros(shape, np.float64)
    amp = 1.0
    for o in range(octaves):
        n = 2 ** (o + 2)
        coarse = rng.standard_normal((n, n))
        yi = np.linspace(0, n - 1, h)
        xi = np.linspace(0, n - 1, w)
        y0 = np.clip(yi.astype(int), 0, n - 2)
        x0 = np.clip(xi.astype(int), 0, n - 2)
        fy = (yi - y0)[:, None]
        fx = (xi - x0)[None, :]
        c00 = coarse[np.ix_(y0, x0)]
        c01 = coarse[np.ix_(y0, x0 + 1)]
        c10 = coarse[np.ix_(y0 + 1, x0)]
        c11 = coarse[np.ix_(y0 + 1, x0 + 1)]
        out += amp * ((1 - fy) * ((1 - fx) * c00 + fx * c01)
                      + fy * ((1 - fx) * c10 + fx * c11))
        amp *= 0.55
    return out


def main():
    rng = np.random.default_rng(20260816)
    elev = _fbm(rng, (H, W))
    moisture = _fbm(rng, (H, W))

    water = 1.0 / (1.0 + np.exp((elev + 0.9) * 8.0))        # low areas
    veg = (1.0 - water) / (1.0 + np.exp(-(moisture) * 4.0))  # wet uplands
    soil = np.clip(1.0 - water - veg, 0.0, 1.0)

    brightness = 1.0 + 0.15 * _fbm(rng, (H, W), octaves=4)
    noise = 0.01

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "xrspatial_tpu", "datasets",
        "sentinel-2")
    os.makedirs(out_dir, exist_ok=True)

    x = X0 + (np.arange(W) + 0.5) * RES
    y = Y0 - (np.arange(H) + 0.5) * RES  # north-up: y descending

    for stem, name, (rw, rv, rs) in BANDS:
        refl = (water * rw + veg * rv + soil * rs) * brightness
        refl = refl + noise * rng.standard_normal((H, W))
        refl = np.clip(refl, 0.0, 1.0).astype(np.float32) * 10000.0
        np.savez_compressed(
            os.path.join(out_dir, stem + ".npz"),
            data=refl.astype(np.float32), name=name, y=y, x=x,
            res=np.array([RES, RES]))
        print(f"wrote {stem}.npz  ({name})  "
              f"mean={refl.mean():.0f} range=[{refl.min():.0f}, "
              f"{refl.max():.0f}]")


if __name__ == "__main__":
    main()

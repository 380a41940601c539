"""Bundled sample data: loader + CLI fetch-data.

Mirrors the reference's datasets contract (datasets/__init__.py:25-48):
``get_data("sentinel-2")`` returns a dict of band-name -> DataArray.
The bundled bands here are deterministic synthetic sentinel-2-like
scenes (tools/make_sample_data.py), not the reference's imagery.
"""

import numpy as np
import pytest

from xrspatial_tpu.datasets import available_datasets, get_data

EXPECTED_BANDS = {"Blue", "Green", "Red", "NIR", "SWIR1", "SWIR2"}


def test_sentinel2_available():
    assert "sentinel-2" in available_datasets


def test_get_data_returns_band_dataarrays():
    data = get_data("sentinel-2")
    assert set(data) == EXPECTED_BANDS
    for name, arr in data.items():
        assert arr.name == name
        assert arr.dims == ("y", "x")
        assert arr.shape == (300, 300)
        assert arr.attrs["res"] == (10.0, 10.0)
        vals = np.asarray(arr.data)
        assert np.isfinite(vals).all()
        assert vals.min() >= 0.0 and vals.max() <= 10000.0
    # north-up convention: y strictly descending, x ascending
    y = np.asarray(data["Red"]["y"].data)
    x = np.asarray(data["Red"]["x"].data)
    assert (np.diff(y) < 0).all() and (np.diff(x) > 0).all()


def test_get_data_unknown_raises():
    with pytest.raises(ValueError, match="not available"):
        get_data("landsat-99")


def test_bands_feed_multispectral():
    from xrspatial_tpu.multispectral import ndvi
    data = get_data("sentinel-2")
    out = np.asarray(ndvi(data["NIR"], data["Red"]).data)
    assert np.isfinite(out).all()
    assert out.min() >= -1.0 and out.max() <= 1.0
    # the synthetic scene has vegetated uplands: some high-NDVI area
    assert (out > 0.4).mean() > 0.05


def test_cli_fetch_data(tmp_path):
    from xrspatial_tpu.__main__ import main
    rc = main(["fetch-data", str(tmp_path / "d")])
    assert rc == 0
    got = sorted(p.name for p in (tmp_path / "d" / "sentinel-2").iterdir())
    assert got == ["blue_band.npz", "green_band.npz", "nir_band.npz",
                   "red_band.npz", "swir1_band.npz", "swir2_band.npz"]


def test_cli_examples_lists_sentinel2(capsys):
    from xrspatial_tpu.__main__ import main
    assert main(["examples"]) == 0
    assert "sentinel-2" in capsys.readouterr().out

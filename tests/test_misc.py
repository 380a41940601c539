"""Tests for datasets, esri, CLI, dataset_support passthrough."""

import numpy as np
import pytest

from xrspatial_tpu.datasets import available_datasets, get_data, make_terrain
from xrspatial_tpu.esri import featureset_to_dataframe


def test_make_terrain():
    t = make_terrain(shape=(64, 80), scale=20.0, octaves=3)
    assert t.shape == (64, 80)
    assert t.name == "terrain"
    assert t.attrs == {"res": 1}
    data = np.asarray(t.data)
    assert np.isfinite(data).all()
    assert data.std() > 0
    # deterministic (fixed base seed 42)
    t2 = make_terrain(shape=(64, 80), scale=20.0, octaves=3)
    np.testing.assert_array_equal(data, np.asarray(t2.data))


def test_get_data_unknown():
    with pytest.raises(ValueError):
        get_data("nope-not-real")


def test_featureset_to_dataframe():
    fs = {
        "features": [
            {"attributes": {"id": 1, "v": 10.0}},
            {"attributes": {"id": 2, "v": 20.0}},
        ],
        "fieldAliases": {"v": "value"},
    }
    df = featureset_to_dataframe(fs)
    assert list(df.columns) == ["id", "v"]
    df2 = featureset_to_dataframe(fs, use_aliases=True)
    assert "value" in df2.columns


def test_cli_info_and_examples(capsys):
    from xrspatial_tpu.__main__ import main
    assert main(["info"]) == 0
    assert "xrspatial_tpu" in capsys.readouterr().out
    assert main(["examples"]) == 0
    assert main(["bogus"]) == 1


def test_benchmark_suite_smoke():
    # the ASV-style suite constructs and runs (two cheap classes, tiny size)
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    from benchmarks.suite import Slope, Zonal
    for cls in (Slope, Zonal):
        b = cls()
        b.params = ([32],)
        b.repeat = 1
        results = list(b.run())
        assert results, cls.__name__
        for name, nx, res in results:
            assert not isinstance(res, Exception), (name, res)

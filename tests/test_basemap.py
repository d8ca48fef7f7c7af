"""Third-catalog basemap analog (02planet.py): month mapping vs DuckDB,
and the monthly-composite stack end to end vs its SQL oracle."""

import duckdb
import numpy as np

from kaza_lcms_ray.sources import basemap


def test_month_of_doy_matches_duckdb():
    years, doys = [], []
    for y in (2019, 2020, 2021, 2022, 2024, 2100, 2000):
        leap = (y % 4 == 0) and (y % 100 != 0 or y % 400 == 0)
        n = 366 if leap else 365
        years.extend([y] * n)
        doys.extend(range(1, n + 1))
    y = np.array(years, dtype=np.int64)
    d = np.array(doys, dtype=np.int64)
    got = basemap.month_of_doy(y, d)

    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"year": y, "doy": d}))
    mexpr = basemap.month_sql_expr('"year"', "doy")
    want = con.execute(f"SELECT {mexpr} FROM t").fetchnumpy()
    np.testing.assert_array_equal(got, list(want.values())[0])


def test_planet_stack_matches_oracle(synth_small):
    import pandas as pd

    import __ray_entry__ as e

    sf_dir = "/root/testdata/sf0.001"
    got = (
        e.queries()["planet_stack"](sf_dir)
        .to_pandas()
        .sort_values(["cell_id", "month"])
        .reset_index(drop=True)
    )
    assert len(got) > 0
    assert (got["month"].between(1, 12)).all()
    # mean composite bounded by band range; indices in [-1, 1]-ish
    assert got["NDVI"].abs().max() <= 1.0 + 1e-12

    con = duckdb.connect()
    want = (
        con.execute(e.oracle_sql_for(0.001)["planet_stack"])
        .df()
        .sort_values(["cell_id", "month"])
        .reset_index(drop=True)
    )
    assert len(want) == len(got)
    for c in ("n_obs", "B", "G", "R", "N", "NDVI", "NDWI", "SAVI",
              "elev", "slope_deg", "aspect_deg"):
        pd.testing.assert_series_equal(
            got[c].astype(float), want[c].astype(float), check_names=False,
            rtol=0, atol=0,
        )

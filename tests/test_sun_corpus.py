"""Sun-elevation sanity corpus — the port of the reference's
path164sundata.json corpus test (tests/test_sun_utils.py:120-135):
~100 synthetic (bbox, date, time) rows across a year and both
hemispheres; for each, the 10x10 per-pixel grid must bracket its own
center value, show a latitude gradient, and stay physical."""

import numpy as np
import pytest

from rio_toa_spark.functions import sun


def _corpus(n=100):
    rng = np.random.default_rng(164)
    rows = []
    for i in range(n):
        lat = float(rng.uniform(-55, 55))
        lon = float(rng.uniform(-175, 175))
        doy = int(rng.integers(1, 366))
        # sun-synchronous-style local ~10:30 acquisition
        utc_hour = (10.5 - lon / 15.0) % 24.0
        hh, rem = int(utc_hour), utc_hour % 1
        mm = int(rem * 60)
        ss = int((rem * 60 - mm) * 60)
        import datetime

        date = (datetime.date(2015, 1, 1) + datetime.timedelta(days=doy - 1)).isoformat()
        time_s = "%02d:%02d:%02d.0000000Z" % (hh, mm, ss)
        bbox = [lon - 1.0, lat - 1.0, lon + 1.0, lat + 1.0]
        rows.append((bbox, date, time_s, lat, doy))
    return rows


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


def test_corpus_grids_bracket_center(corpus):
    for bbox, date, time_s, lat, doy in corpus:
        grid = sun.sun_elevation(bbox, (10, 10), date, time_s)
        center = grid[4:6, 4:6].mean()
        assert grid.min() <= center <= grid.max()
        assert grid.min() > -90.0 and grid.max() < 90.0


def test_corpus_daytime_fraction(corpus):
    """Local ~10:30 acquisitions in |lat|<55 should be daylight for the
    overwhelming majority of the corpus."""
    day = sum(
        1
        for bbox, date, time_s, lat, doy in corpus
        if sun.sun_elevation(bbox, (10, 10), date, time_s).mean() > 0
    )
    assert day >= len(corpus) * 0.9


def test_corpus_latitude_gradient(corpus):
    """Within each grid, elevation varies monotonically-ish with
    latitude: north and south edges must differ."""
    for bbox, date, time_s, lat, doy in corpus[:40]:
        grid = sun.sun_elevation(bbox, (10, 10), date, time_s)
        assert abs(float(grid[0].mean() - grid[-1].mean())) > 1e-4


def test_corpus_strip_equals_full(corpus):
    """The strip variant must reproduce the full grid bitwise on every
    corpus row (the cache-blocking contract)."""
    for bbox, date, time_s, lat, doy in corpus[:25]:
        full = sun.sun_elevation(bbox, (16, 16), date, time_s)
        parts = [
            sun.sun_elevation_rows(bbox, (16, 16), r0, min(r0 + 5, 16), date, time_s)
            for r0 in range(0, 16, 5)
        ]
        assert np.concatenate(parts).tobytes() == full.tobytes()

"""Interactive dashboard (K4): the five reference pages served over HTTP
from the live view dictionary, fetched like a browser would."""

from __future__ import annotations

import urllib.request

import pytest


@pytest.fixture(scope="module")
def dash_server(spark, sf_dir):
    from prac_data_pipelines_spark.pipeline import run_pipeline
    from prac_data_pipelines_spark.sinks.dashboard import serve_dashboard

    views = run_pipeline(spark, sf_dir)
    server, port = serve_dashboard(views)
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _get(url: str) -> tuple[int, str]:
    with urllib.request.urlopen(url, timeout=120) as resp:
        return resp.status, resp.read().decode()


def test_all_five_pages_render(dash_server):
    from prac_data_pipelines_spark.sinks.dashboard import PAGES

    for slug, title in PAGES:
        status, body = _get(f"{dash_server}/{slug}")
        assert status == 200
        assert title.replace("&", "&amp;") in body, slug
        assert "<nav>" in body and "<table>" in body, slug


def test_root_serves_resumen_with_cards_and_donut(dash_server):
    status, body = _get(dash_server)
    assert status == 200
    assert "Resumen Ejecutivo" in body
    assert 'class="card"' in body
    assert "<svg" in body and "<path" in body  # donut chart


def test_cartera_has_aging_bars(dash_server):
    _, body = _get(f"{dash_server}/cartera")
    assert "<rect" in body  # horizontal bars
    assert "VIGENTE" in body


def test_kpis_has_pareto(dash_server):
    _, body = _get(f"{dash_server}/kpis")
    assert "<polyline" in body  # cumulative-% line
    assert "stroke-dasharray" in body  # 80% guide


def test_refresh_redirects_and_recollects(dash_server):
    status, body = _get(f"{dash_server}/refresh")  # urllib follows the 303
    assert status == 200 and "Resumen Ejecutivo" in body


def test_unknown_page_404(dash_server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{dash_server}/nope")
    assert e.value.code == 404

"""A1 HTTP health endpoint parity (/root/reference/src/app.ts:23-25):
GET /info must return 200 {"status": "OK"}. No SparkSession needed."""

import json
import urllib.error
import urllib.request

import pytest

from change_data_capturer_ms_spark.health import HealthServer


def _get(port: int, path: str):
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=5) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def test_info_reference_parity():
    with HealthServer(0) as hs:
        status, body = _get(hs.port, "/info")
    assert status == 200
    assert body == {"status": "OK"}  # exact app.ts:23-25 payload


def test_status_merges_live_provider():
    state = {"n": 0}

    def provider():
        state["n"] += 1
        return {"lease": {"id": "changelog", "seq": state["n"]}}

    with HealthServer(0, status_provider=provider) as hs:
        _, b1 = _get(hs.port, "/status")
        _, b2 = _get(hs.port, "/status")
    # polled per request, not captured once
    assert b1["lease"]["seq"] == 1 and b2["lease"]["seq"] == 2
    assert b1["status"] == "OK"


def test_provider_error_degrades_not_flaps():
    def provider():
        raise RuntimeError("wedged")

    with HealthServer(0, status_provider=provider) as hs:
        status, body = _get(hs.port, "/status")
        # /info stays a pure static OK regardless of provider health
        info_status, info_body = _get(hs.port, "/info")
    assert status == 200 and body["provider_error"] == "wedged"
    assert info_status == 200 and info_body == {"status": "OK"}


def test_unknown_route_404():
    with HealthServer(0) as hs:
        status, body = _get(hs.port, "/nope")
    assert status == 404 and body == {"status": "Not Found"}


def test_stop_frees_port():
    hs = HealthServer(0).start()
    port = hs.port
    hs.stop()
    with pytest.raises(Exception):
        _get(port, "/info")

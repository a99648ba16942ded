"""HTTP push source tests: extraction parity (unit) + live server e2e
through the Python Data Source API."""

from __future__ import annotations

import gzip
import socket
import time
import urllib.error
import urllib.request

import pytest

from atiesh_spark.sources.http_push import extract_events, register_http_push


# --- unit: request extraction mirrors HttpSource.httpRequestExtractEvents ---


def test_extract_plain_split():
    evs = extract_events(b"a\nb\nc", None, {})
    assert [v for v, _ in evs] == ["a", "b", "c"]


def test_extract_trailing_delimiter_dropped():
    """Scala String.split(char) drops trailing empties — 'rec\\n' is one
    event (HttpSource.scala:116-117), not an event plus an empty one."""
    evs = extract_events(b"a\n", None, {})
    assert [v for v, _ in evs] == ["a"]
    evs = extract_events(b"a\n\nb\n\n", None, {})
    assert [v for v, _ in evs] == ["a", "", "b"]  # interior empties kept


def test_extract_gzip_body():
    evs = extract_events(gzip.compress(b"x\ny"), "gzip", {})
    assert [v for v, _ in evs] == ["x", "y"]


def test_extract_unsupported_encoding_is_400_path():
    with pytest.raises(ValueError, match="unsupported content-encoding"):
        extract_events(b"x", "deflate", {})


def test_extract_header_capture_lowercase_prefix():
    """Captured keys are stored lowercased (k.toLowerCase,
    HttpSource.scala:119-126), not in wire case."""
    evs = extract_events(
        b"x", None,
        {"X-Atiesh-Id": "9", "x-atiesh-tag": "t", "Content-Type": "text/plain"},
        capture_prefix="X-ATIESH-",
    )
    assert evs[0][1] == {"x-atiesh-id": "9", "x-atiesh-tag": "t"}


def test_extract_custom_delimiter_and_charset():
    evs = extract_events("é;è".encode("utf-8"), None, {}, delimiter=";")
    assert [v for v, _ in evs] == ["é", "è"]


# --- e2e: live server through the streaming engine ---------------------------


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _post(port: int, body: bytes, headers: dict | None = None) -> int:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/ingest", data=body, headers=headers or {}, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=5) as resp:
            return resp.status
    except urllib.error.HTTPError as e:
        return e.code


def test_http_push_stream_end_to_end(spark, tmp_path):
    register_http_push(spark)
    port = _free_port()
    df = (
        spark.readStream.format("http_push")
        .option("port", port)
        .option("capturePrefix", "x-atiesh-")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("http_push_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        # server binds inside the reader; wait for it to accept
        deadline = time.time() + 30
        status = None
        while time.time() < deadline:
            try:
                status = _post(port, b"e1\ne2", {"X-Atiesh-Origin": "t1"})
                break
            except OSError:
                time.sleep(0.5)
        assert status == 201

        assert _post(port, gzip.compress(b"e3"), {"Content-Encoding": "gzip"}) == 201
        assert _post(port, b"bad", {"Content-Encoding": "deflate"}) == 400

        rows = []
        deadline = time.time() + 30
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM http_push_sink").collect()
            if len(rows) >= 3:
                break
            time.sleep(0.5)
        values = sorted(r["value"] for r in rows)
        assert values == ["e1", "e2", "e3"]
        tagged = {r["value"]: r["headers"] for r in rows}
        assert tagged["e1"].get("x-atiesh-origin") == "t1"
        assert tagged["e3"] == {}
    finally:
        q.stop()

"""Sink writers (SURVEY.md §2.4).

Each writer is a callable ``(batch_df, batch_id) -> None`` usable inside
``foreachBatch`` (the micro-batch commit barrier is the reference's
Commit/Transaction ack — the batch completes only when the writer
returns, giving at-least-once into external systems).

External-protocol writers (HTTP, syslog) take injectable transports so
the retry/format logic is unit-testable without a network; per-partition
execution keeps connections executor-side (no driver collect).
"""

from __future__ import annotations

import base64
import gzip as _gzip
import random
import socket
import time
import urllib.error
import urllib.request
from collections.abc import Callable, Iterable
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --- trivial sinks -----------------------------------------------------------


def devnull_writer(batch_df: DataFrame, batch_id: int) -> None:
    """Accept and discard everything (reference sink DevNull.scala:14-23).

    Still materializes the batch (noop format) so upstream effects and
    metrics fire exactly as with a real sink.
    """
    batch_df.write.format("noop").mode("overwrite").save()


def parquet_writer(path: str) -> Callable[[DataFrame, int], None]:
    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    return write


def idempotent_parquet_writer(path: str) -> Callable[[DataFrame, int], None]:
    """Exactly-once parquet sink: partition by batch_id, overwrite only
    that partition. A replayed micro-batch (sink failed before the
    checkpoint committed) rewrites its own partition instead of
    appending duplicates — at-least-once replay + idempotent write =
    effectively exactly-once output."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("__batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(path)
        )

    return write


def memory_rows(collected: list) -> Callable[[DataFrame, int], None]:
    """Test sink: append collected rows to a driver-side list."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        collected.extend(batch_df.collect())

    return write


# --- kafka producer shape ----------------------------------------------------


def kafka_sink_frame(
    df: DataFrame,
    static_topic: str | None = None,
    topic_header: str | None = None,
) -> DataFrame:
    """Shape events into Kafka's writer schema (key, value, topic).

    Key is a random UUID with no partition/timestamp, exactly the
    reference's MetadataParser (KafkaSink.scala:18-21); topic comes from
    a per-event header with static fallback (KafkaLimitAckSink.scala:48-50)
    — Spark's kafka sink honors a dynamic `topic` column natively.
    """
    if static_topic is None and topic_header is None:
        raise ValueError("need static_topic and/or topic_header")
    if topic_header is not None:
        topic = F.element_at(F.col("headers"), F.lit(topic_header))
        if static_topic is not None:
            topic = F.coalesce(topic, F.lit(static_topic))
    else:
        topic = F.lit(static_topic)
    return df.select(
        F.expr("uuid()").alias("key"),
        F.col("value").cast("string").alias("value"),
        topic.alias("topic"),
    )


def kafka_sink_options(bootstrap_servers: str, must_send: bool = False) -> dict[str, str]:
    """Producer options; must_send ≅ infinite retry + idempotence
    (KafkaLimitAckSinkSemantics.scala:56-120); in-flight bounding ≅
    producer buffer configs (max-pending-acks backpressure collapses
    into the micro-batch barrier)."""
    opts = {"kafka.bootstrap.servers": bootstrap_servers}
    if must_send:
        opts["kafka.retries"] = str(2**31 - 1)
        opts["kafka.enable.idempotence"] = "true"
    return opts


# --- HTTP sink ---------------------------------------------------------------


def _default_http_transport(
    method: str, url: str, body: bytes | None, headers: dict[str, str], timeout: float
) -> tuple[int, bytes]:
    """One-shot transport: fresh connection per request (kept for injection
    compatibility; the writer's hot path uses PersistentHttpTransport)."""
    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


class PersistentHttpTransport:
    """Keep-alive transport: one TCP (or TLS) connection per host, reused
    across requests — the reference's host connection pool semantics
    (HttpSinkSemantics.scala:121-190, 32 pooled connections + bounded
    queue). Spark's unit of parallelism is the partition, so the pool
    collapses to one persistent connection per partition-task; N parallel
    partitions give the pooling fan-out. Broken connections are dropped
    and the error surfaces to the caller's retry policy (which reconnects
    on the next attempt).

    Created inside the partition task (never pickled); call ``close()``
    when the partition ends.
    """

    def __init__(self) -> None:
        self._conns: dict[tuple[str, str], object] = {}

    def __call__(
        self, method: str, url: str, body: bytes | None,
        headers: dict[str, str], timeout: float,
    ) -> tuple[int, bytes]:
        import http.client
        import urllib.parse

        u = urllib.parse.urlsplit(url)
        key = (u.scheme, u.netloc)
        conn = self._conns.get(key)
        if conn is None:
            cls = (
                http.client.HTTPSConnection
                if u.scheme == "https"
                else http.client.HTTPConnection
            )
            conn = cls(u.netloc, timeout=timeout)
            self._conns[key] = conn
        path = u.path or "/"
        if u.query:
            path = f"{path}?{u.query}"
        try:
            conn.request(method, path, body=body, headers=headers)
            resp = conn.getresponse()
            return resp.status, resp.read()
        except Exception:
            # connection is in an unknown state: drop it so the caller's
            # retry gets a fresh one
            conn.close()
            self._conns.pop(key, None)
            raise

    def close(self) -> None:
        for conn in self._conns.values():
            conn.close()
        self._conns.clear()


class HttpSinkWriter:
    """HTTP writer with the reference's request/retry semantics.

    Mirrors HttpSink.scala:55-315 + HttpLimitRequestSinkSemantics:
    - POST/PUT send the payload as body; GET carries it as a query
      param (`event-query-key`, HttpSink.scala:229-256)
    - batch mode joins up to ``batch_size`` payloads with newlines into
      one request body (HttpSink.scala:151-154)
    - optional gzip body + Content-Encoding (HttpSink.scala:166-178)
    - basic auth via precomputed Authorization header
      (HttpSink.scala:118-143)
    - response policy (HttpSink.scala:270-310): 200/201 done; other
      4xx drop (log + counter); 5xx/transport error retry with
      backoff min(2^n + rand(0,1), 32)s up to ``max_retries``
      (HttpLimitRequestSinkSemantics.scala:123-141)
    - bounded in-flight requests become the micro-batch barrier; the
      shutdown dump/replay file is subsumed by checkpoint replay
      (semantic mapping documented in SURVEY.md §7.4)

    ``transport``/``sleeper`` are injectable for tests.
    """

    def __init__(
        self,
        url: str,
        method: str = "POST",
        batch_size: int | None = None,
        use_gzip: bool = False,
        auth: tuple[str, str] | None = None,
        content_type: str = "text/plain",
        query_key: str = "payload",
        max_retries: int = 3,
        backoff_cap: float = 32.0,
        timeout: float = 10.0,
        transport: Callable[..., tuple[int, bytes]] | None = None,
        sleeper: Callable[[float], None] = time.sleep,
    ) -> None:
        if method not in ("POST", "PUT", "GET"):
            raise ValueError(f"unsupported method {method!r}")
        if method == "GET" and use_gzip:
            # GET carries the payload in the query string — a gzip
            # Content-Encoding header with no body would make compliant
            # servers reject every request
            raise ValueError("gzip is only valid for body-carrying methods (POST/PUT)")
        self.url = url
        self.method = method
        self.batch_size = batch_size
        self.use_gzip = use_gzip
        self.content_type = content_type
        self.query_key = query_key
        self.max_retries = max_retries
        self.backoff_cap = backoff_cap
        self.timeout = timeout
        # None -> a PersistentHttpTransport per partition (keep-alive);
        # injected transports are used as-is (tests, custom senders)
        self.transport = transport
        self.sleeper = sleeper
        self.headers: dict[str, str] = {"Content-Type": content_type}
        if auth is not None:
            token = base64.b64encode(f"{auth[0]}:{auth[1]}".encode()).decode()
            self.headers["Authorization"] = f"Basic {token}"
        if use_gzip:
            self.headers["Content-Encoding"] = "gzip"

    # -- single request with the reference's retry/backoff policy
    def _send(self, payload: str, transport: Callable[..., tuple[int, bytes]] | None = None) -> str:
        transport = transport or self.transport or _default_http_transport
        attempt = 0
        while True:
            if self.method == "GET":
                url = f"{self.url}?{self.query_key}={urllib.request.quote(payload)}"
                body = None
            else:
                url = self.url
                body = payload.encode("utf-8")
                if self.use_gzip:
                    body = _gzip.compress(body, mtime=0)
            try:
                status, _ = transport(self.method, url, body, self.headers, self.timeout)
            except Exception:
                status = None  # transport error -> retry path
            if status in (200, 201):
                return "ok"
            if status is not None and 400 <= status < 500:
                return "dropped"  # 4xx: do not retry (HttpSink.scala:286-291)
            if attempt >= self.max_retries:
                raise RuntimeError(
                    f"HTTP sink exhausted {self.max_retries} retries (last status {status})"
                )
            delay = min(2.0**attempt + random.random(), self.backoff_cap)
            self.sleeper(delay)
            attempt += 1

    def _send_partition(self, values: Iterable[str]) -> None:
        # connection reuse: when no transport was injected, the whole
        # partition shares one persistent keep-alive connection instead
        # of a fresh TCP handshake per request (the dominant cost at any
        # real send rate; mirrors HttpSinkSemantics.scala:121-190)
        owned = None if self.transport is not None else PersistentHttpTransport()
        transport = self.transport or owned
        try:
            if self.batch_size is None:
                for v in values:
                    self._send(v, transport)
                return
            buf: list[str] = []
            for v in values:
                buf.append(v)
                if len(buf) >= self.batch_size:
                    self._send("\n".join(buf), transport)
                    buf.clear()
            if buf:
                self._send("\n".join(buf), transport)
        finally:
            if owned is not None:
                owned.close()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        send_partition = self._send_partition
        batch_df.select(F.col("value").cast("string")).foreachPartition(
            lambda rows: send_partition(r[0] for r in rows if r[0] is not None)
        )


# --- syslog sink -------------------------------------------------------------

_FACILITIES = {"kern": 0, "user": 1, "daemon": 3, "local0": 16, "local7": 23}
_SEVERITIES = {
    "emerg": 0, "alert": 1, "crit": 2, "err": 3,
    "warning": 4, "notice": 5, "info": 6, "debug": 7,
}


def format_syslog(
    msg: str,
    rfc: str = "3164",
    facility: str = "user",
    severity: str = "info",
    hostname: str | None = None,
    appname: str = "atiesh",
    ts: datetime | None = None,
) -> bytes:
    """RFC3164 / RFC5424 framing (SyslogSinkSemantics.scala:19-135)."""
    pri = _FACILITIES[facility] * 8 + _SEVERITIES[severity]
    host = hostname or socket.gethostname()
    now = ts or datetime.now(timezone.utc)
    if rfc == "3164":
        stamp = now.strftime("%b %e %H:%M:%S")
        return f"<{pri}>{stamp} {host} {appname}: {msg}".encode()
    if rfc == "5424":
        stamp = now.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
        return f"<{pri}>1 {stamp} {host} {appname} - - - {msg}".encode()
    raise ValueError(f"unsupported syslog rfc {rfc!r}")


def udp_syslog_sender(host: str, port: int):
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    addr = (host, port)

    def send(b: bytes) -> None:
        sock.sendto(b, addr)

    return send


def octet_count_frame(b: bytes) -> bytes:
    """RFC 5425 octet-counting frame: 'MSG-LEN SP SYSLOG-MSG'."""
    return str(len(b)).encode("ascii") + b" " + b


def tcp_syslog_sender(host: str, port: int, use_tls: bool = False,
                      cafile: str | None = None, framing: str = "lf"):
    """Stream transport; TLS via stdlib ssl (covers the reference's
    TCP/TLS sender variants + CA-cert option,
    SyslogSinkSemantics.scala:49-135, PKI.scala:20-74).

    Framing: 'lf' (RFC 6587 non-transparent, the default — matching the
    reference, which pairs TLS with LF framing in its rfc3164tls/
    rfc6587tls variants) or 'octet' (RFC 5425 octet counting — required
    by strict RFC 5425 TLS receivers, which reject LF framing). Framing
    and transport compose freely, like the reference's format x sender
    matrix.
    """
    if framing not in ("lf", "octet"):
        raise ValueError(f"framing must be lf|octet, got {framing!r}")
    sock = socket.create_connection((host, port), timeout=10)
    if use_tls:
        import ssl

        ctx = ssl.create_default_context(cafile=cafile)
        sock = ctx.wrap_socket(sock, server_hostname=host)
    octet = framing == "octet"

    def send(b: bytes) -> None:
        sock.sendall(octet_count_frame(b) if octet else b + b"\n")

    return send


class SyslogSinkWriter:
    """Sends each event body as one syslog message.

    Reference ships 8 transport variants (RFC x TCP/UDP/TLS,
    SyslogSinkSemantics.scala:19-42); here framing (RFC 3164/5424) and
    transport (udp/tcp/tls senders above, or any injected
    ``sender(bytes)``) compose to the same matrix.
    """

    def __init__(
        self,
        host: str = "localhost",
        port: int = 514,
        rfc: str = "3164",
        facility: str = "user",
        severity: str = "info",
        appname: str = "atiesh",
        transport: str = "udp",
        use_tls: bool = False,
        cafile: str | None = None,
        framing: str = "lf",
        sender: Callable[[bytes], None] | None = None,
    ) -> None:
        self.host, self.port = host, port
        self.rfc, self.facility, self.severity = rfc, facility, severity
        self.appname = appname
        self.transport, self.use_tls, self.cafile = transport, use_tls, cafile
        self.framing = framing
        self.sender = sender

    def _make_sender(self) -> Callable[[bytes], None]:
        if self.sender is not None:
            return self.sender
        if self.transport == "tcp" or self.use_tls:
            return tcp_syslog_sender(
                self.host, self.port, self.use_tls, self.cafile, self.framing
            )
        return udp_syslog_sender(self.host, self.port)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        rfc, fac, sev, app = self.rfc, self.facility, self.severity, self.appname
        make_sender = self._make_sender

        def send_rows(rows) -> None:
            send = make_sender()
            for r in rows:
                if r[0] is not None:
                    send(format_syslog(r[0], rfc=rfc, facility=fac, severity=sev, appname=app))

        batch_df.select(F.col("value").cast("string")).foreachPartition(send_rows)


# --- log-service (SLS-shaped) sink -------------------------------------------


class LogServiceSinkWriter:
    """Log-service producer in the shape of AliyunSLSSinkSemantics
    (AliyunSLSSinkSemantics.scala:89-214): events become (topic, source,
    shard_key, fields) records, sent singly or as one grouped batch per
    partition, with success/failure counters fed by the send outcome.

    The vendor SDK is injected as ``client(records: list[dict]) -> None``
    (raises on failure; must be picklable — it runs inside partition
    tasks) — the reference likewise ships semantics only, no concrete
    component (SURVEY.md §2.4).

    Scale shape: record building and client sends run per partition on
    the executors via Arrow-batched ``mapInPandas`` (no RDD hop — rows
    never round-trip through row-at-a-time Python pickling); only one
    (ok, failed, err) counter row per partition returns to the driver —
    never the data rows. A failed group aborts its partition's remaining
    sends; the driver then raises to fail the batch -> checkpoint replay
    (at-least-once), mirroring the reference's transaction-nack path.
    """

    def __init__(
        self,
        client: Callable[[list[dict]], None],
        topic: str | None = None,
        source: str | None = None,
        shard_key_header: str | None = None,
        grouped: bool = True,
    ) -> None:
        self.client = client
        self.topic, self.source = topic, source
        self.shard_key_header = shard_key_header
        self.grouped = grouped
        self.success_count = 0
        self.failure_count = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        client, grouped = self.client, self.grouped
        topic, source, skh = self.topic, self.source, self.shard_key_header

        def send_partition(pdfs) -> Iterable:
            import pandas as pd

            # one send pass per PARTITION, not per Arrow batch: grouped
            # mode's contract is one group per partition, so records
            # accumulate across the iterator before sending (the same
            # buffering the per-partition group build always needed)
            records = []
            for pdf in pdfs:
                for value, headers in zip(pdf["value"], pdf["headers"]):
                    headers = headers or {}
                    records.append(
                        {
                            "topic": topic,
                            "source": source,
                            "shard_key": headers.get(skh) if skh else None,
                            "fields": {"value": value, **headers},
                        }
                    )
            n_ok = n_fail = 0
            err: str | None = None
            groups = [records] if grouped else [[r] for r in records]
            for group in groups:
                if not group:
                    continue
                try:
                    client(group)
                    n_ok += len(group)
                except Exception as exc:  # abort partition, report outcome
                    n_fail += len(group)
                    err = repr(exc)
                    break
            yield pd.DataFrame({"ok": [n_ok], "fail": [n_fail], "err": [err]})

        # O(num_partitions) counter rows — not data — come back to the
        # driver; the exception is re-raised driver-side so the counter
        # updates survive (executor-raised errors would fail the task
        # before its counters ship).
        stats = (
            batch_df.select("value", "headers")
            .mapInPandas(send_partition, "ok long, fail long, err string")
            .collect()
        )
        self.success_count += sum(s["ok"] for s in stats)
        self.failure_count += sum(s["fail"] for s in stats)
        errs = [s["err"] for s in stats if s["err"] is not None]
        if errs:
            raise RuntimeError(f"log service sink failed: {errs[0]}")


# --- registry ----------------------------------------------------------------


def build_sink_writer(cfg: dict) -> Callable[[DataFrame, int], None]:
    """Instantiate a sink writer from a pipeline-spec section."""
    stype = cfg.get("type")
    if stype == "devnull":
        return devnull_writer
    if stype == "parquet":
        return parquet_writer(cfg["path"])
    if stype == "parquet_exactly_once":
        return idempotent_parquet_writer(cfg["path"])
    if stype == "memory":
        return memory_rows(cfg["collected"])
    if stype == "http":
        return HttpSinkWriter(
            url=cfg["url"],
            method=cfg.get("method", "POST"),
            batch_size=cfg.get("batch_size"),
            use_gzip=cfg.get("gzip", False),
            auth=tuple(cfg["auth"]) if "auth" in cfg else None,
            content_type=cfg.get("content_type", "text/plain"),
            max_retries=cfg.get("max_retries", 3),
            transport=cfg.get("transport"),
            sleeper=cfg.get("sleeper", time.sleep),
        )
    if stype == "syslog":
        return SyslogSinkWriter(
            host=cfg.get("host", "localhost"),
            port=cfg.get("port", 514),
            rfc=cfg.get("rfc", "3164"),
            facility=cfg.get("facility", "user"),
            severity=cfg.get("severity", "info"),
            appname=cfg.get("appname", "atiesh"),
            transport=cfg.get("transport", "udp"),
            use_tls=cfg.get("tls", False),
            cafile=cfg.get("cafile"),
            framing=cfg.get("framing", "lf"),
            sender=cfg.get("sender"),
        )
    if stype == "logservice":
        return LogServiceSinkWriter(
            client=cfg["client"],
            topic=cfg.get("topic"),
            source=cfg.get("source"),
            shard_key_header=cfg.get("shard_key_header"),
            grouped=cfg.get("grouped", True),
        )
    raise ValueError(f"unknown sink type {stype!r}")

"""Prometheus remote-read serving layer (SURVEY §3.1 end-to-end).

Request path, mirroring agni server.go:64-97 stage by stage:
  POST /read body --snappy--> protobuf ReadRequest        (S12)
  per Query: (start_ms, end_ms, matchers)                  (server.go:100-103)
  matcher translation -> agni_spark.Matcher                (server.go:107-132)
  Querier.select(...) -> ONE Catalyst plan                 (stages 4-5 collapse)
  matrix assembly: groupBy(series) sorted sample arrays    (server.go:134-162)
  proto ReadResponse --snappy--> HTTP 200                  (S13)

The only collect() in the engine sits here, at the serving edge —
everything upstream is distributed. Matrix rows arrive series-sorted
(label-set order == series_id order) with time-sorted samples, the
reference's output contract (querier.go:314-328).
"""

from __future__ import annotations

import hashlib
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import functions as F

from agni_spark.matchers import Matcher
from agni_spark.protocol import remote_pb as pb
from agni_spark.protocol import snappy_codec as snappy
from agni_spark.querier import Querier

_WIRE_OPS = {0: "=", 1: "!=", 2: "=~", 3: "!~"}  # remote.proto:53-58


def matchers_from_proto(ms: list[pb.LabelMatcher]) -> list[Matcher]:
    """Wire matcher -> engine matcher (server.go:107-132)."""
    return [Matcher(_WIRE_OPS[m.type], m.name, m.value) for m in ms]


def evaluate_query(querier: Querier, q: pb.Query) -> list[pb.TimeSeries]:
    """One remote-read Query -> list of TimeSeries (the Matrix).

    Sample arrays are assembled DISTRIBUTED per series
    (sort_array(collect_list(...)) — SURVEY §1.4 Matrix mapping); the
    driver only receives the final per-series rows."""
    sel = querier.select(
        matchers_from_proto(q.matchers), mint_ms=q.start_ms, maxt_ms=q.end_ms
    )
    per_series = (
        sel.groupBy("series_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts_ms", "value"))
            ).alias("pts")
        )
        .join(querier.series, "series_id")
        .orderBy("series_id")
    )
    label_cols = [c for c in querier.series.columns if c != "series_id"]
    out = []
    for row in per_series.collect():  # serving edge: results only
        labels = []
        for c in label_cols:
            v = row[c]
            if v is not None:
                name = "__name__" if c == "metric" else c
                labels.append((name, v))
        labels.sort()
        out.append(
            pb.TimeSeries(
                labels=labels,
                samples=[(p.value, p.ts_ms) for p in row.pts],
            )
        )
    return out


def handle_read(querier: Querier, body: bytes) -> bytes:
    """Full request pipeline on raw bytes (transport-independent —
    tested without sockets; the HTTP handler below is a thin shell)."""
    req = pb.decode_read_request(snappy.decompress(body))
    resp = pb.ReadResponse(
        results=[evaluate_query(querier, q) for q in req.queries]
    )
    return snappy.compress(pb.encode_read_response(resp))


# -- streamed remote read (STREAMED_XOR_CHUNKS) ------------------------------
# The response type modern Prometheus (>= 2.13) negotiates: instead of
# one giant sampled Matrix, the server streams framed
# ChunkedReadResponse messages whose payloads are TSDB XOR chunks (the
# E1 encoder reused verbatim). Content negotiation + wire framing
# follow prometheus storage/remote/codec.go NegotiateResponseType and
# storage/remote/chunked.go ChunkedWriter: each frame is
#   uvarint(len(data)) + BE u32 CRC-32C(data) + data,
# data = snappy(marshal(ChunkedReadResponse)).

CONTENT_TYPE_SAMPLES = "application/x-protobuf"
CONTENT_TYPE_STREAMED = (
    "application/x-streamed-protobuf; proto=prometheus.ChunkedReadResponse"
)
_SAMPLES_PER_CHUNK = 120  # tsdb's target chunk fill (head.go appender)


def _uvarint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def write_chunked_frame(data: bytes) -> bytes:
    """One ChunkedWriter frame: uvarint length, CRC-32C, payload."""
    from agni_spark.sources.tsdb_format import _crc32c

    import struct as _struct

    return _uvarint(len(data)) + _struct.pack(">I", _crc32c(data)) + data


def read_chunked_frames(stream: bytes) -> list[bytes]:
    """Split a framed byte stream back into payloads, verifying CRCs
    (the ChunkedReader side of chunked.go)."""
    import struct as _struct

    from agni_spark.protocol.remote_pb import _read_uv
    from agni_spark.sources.tsdb_format import _crc32c

    out, pos = [], 0
    while pos < len(stream):
        ln, pos = _read_uv(stream, pos)
        (crc,) = _struct.unpack(">I", stream[pos : pos + 4])
        pos += 4
        data = stream[pos : pos + ln]
        pos += ln
        if _crc32c(data) != crc:
            raise ValueError("chunked frame CRC mismatch")
        out.append(data)
    return out


def evaluate_query_chunked(
    querier: Querier, q: pb.Query, query_index: int
) -> list[bytes]:
    """One remote-read Query -> framed ChunkedReadResponse messages,
    one frame per series (codec.go StreamChunkedReadResponses flushes
    on a per-series budget; per-series is the natural Spark batch).
    Samples re-encode into XOR chunks of <= 120 samples — the same
    Gorilla bytes a TSDB block would hold, so a chunk-native client
    decodes with its existing path."""
    from agni_spark.sources.tsdb_format import ENC_XOR, encode_xor_chunk

    sel = querier.select(
        matchers_from_proto(q.matchers), mint_ms=q.start_ms, maxt_ms=q.end_ms
    )
    per_series = (
        sel.groupBy("series_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts_ms", "value"))
            ).alias("pts")
        )
        .join(querier.series, "series_id")
        .orderBy("series_id")
    )
    label_cols = [c for c in querier.series.columns if c != "series_id"]
    frames = []
    for row in per_series.collect():  # serving edge: results only
        labels = []
        for c in label_cols:
            v = row[c]
            if v is not None:
                labels.append(("__name__" if c == "metric" else c, v))
        labels.sort()
        pts = [(p.ts_ms, p.value) for p in row.pts]
        chunks = []
        for i in range(0, len(pts), _SAMPLES_PER_CHUNK):
            part = pts[i : i + _SAMPLES_PER_CHUNK]
            chunks.append(
                pb.Chunk(
                    min_time_ms=part[0][0],
                    max_time_ms=part[-1][0],
                    type=ENC_XOR,
                    data=encode_xor_chunk(part),
                )
            )
        msg = pb.ChunkedReadResponse(
            chunked_series=[pb.ChunkedSeries(labels=labels, chunks=chunks)],
            query_index=query_index,
        )
        frames.append(
            write_chunked_frame(
                snappy.compress(pb.encode_chunked_read_response(msg))
            )
        )
    return frames


def handle_read_negotiated(
    querier: Querier, body: bytes
) -> tuple[bytes, str]:
    """POST /read with content negotiation: returns (payload,
    content_type). STREAMED_XOR_CHUNKS is served when the client
    accepts it (first supported entry wins, codec.go semantics);
    otherwise the sampled-Matrix path — byte-identical to before for
    pre-negotiation clients."""
    req = pb.decode_read_request(snappy.decompress(body))
    # codec.go NegotiateResponseType: scan the client's preference
    # list IN ORDER and serve the first type we support; an empty list
    # means the legacy default [SAMPLES]. A client sending
    # [SAMPLES, STREAMED_XOR_CHUNKS] prefers SAMPLES and must NOT get
    # a streamed body it would misparse as a snappy ReadResponse.
    accepted = req.accepted_response_types or [pb.RESPONSE_SAMPLES]
    chosen = next(
        (
            t
            for t in accepted
            if t in (pb.RESPONSE_SAMPLES, pb.RESPONSE_STREAMED_XOR_CHUNKS)
        ),
        None,
    )
    if chosen is None:
        # a NON-EMPTY accepted list with no type we support is a
        # protocol error (codec.go NegotiateResponseType returns an
        # error) — serving SAMPLES anyway would hand the client a body
        # it never agreed to parse. Handler maps this to HTTP 400.
        raise ValueError(
            f"server does not support any of accepted_response_types="
            f"{accepted}"
        )
    if chosen == pb.RESPONSE_STREAMED_XOR_CHUNKS:
        stream = b"".join(
            frame
            for i, q in enumerate(req.queries)
            for frame in evaluate_query_chunked(querier, q, i)
        )
        return stream, CONTENT_TYPE_STREAMED
    resp = pb.ReadResponse(
        results=[evaluate_query(querier, q) for q in req.queries]
    )
    return (
        snappy.compress(pb.encode_read_response(resp)),
        CONTENT_TYPE_SAMPLES,
    )


class RemoteReadServer:
    """Threaded HTTP server exposing POST /read (server.go:51)."""

    def __init__(
        self,
        querier: Querier,
        host: str = "127.0.0.1",
        port: int = 0,
        write_store: str | None = None,
        spark=None,
        alert_rules: list[dict] | None = None,
    ):
        """write_store + spark enable POST /write (remote-write receive
        into that block store); without them /write returns 404 — the
        reference's exact read-only posture (server.go:51-52).
        `alert_rules` configures GET /api/v1/rules (see handle_rules)."""
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self) -> None:  # noqa: N802
                if self.path not in ("/read", "/write"):
                    self.send_error(404)
                    return
                if self.path == "/write" and (
                    outer.write_store is None or outer.spark is None
                ):
                    self.send_error(404, "write endpoint not enabled")
                    return
                try:
                    body = self.rfile.read(
                        int(self.headers.get("Content-Length", "0"))
                    )
                    if self.path == "/write":
                        n = handle_write(outer.spark, body, outer.write_store)
                        payload = str(n).encode()
                        ctype = "application/x-protobuf"
                    else:
                        payload, ctype = handle_read_negotiated(
                            outer.querier, body
                        )
                except Exception as e:  # decode/eval error -> 400
                    self.send_error(400, str(e)[:200])
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                if ctype == CONTENT_TYPE_SAMPLES:
                    # frames of a streamed response are internally
                    # snappy-compressed; only the sampled body is
                    # whole-message snappy (chunked.go vs codec.go)
                    self.send_header("Content-Encoding", "snappy")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self) -> None:  # noqa: N802
                from urllib.parse import parse_qs, urlparse

                parsed = urlparse(self.path)
                ctype = "application/json"
                try:
                    if parsed.path == "/federate":
                        payload = handle_federate(
                            outer.querier, parse_qs(parsed.query)
                        )
                        ctype = "text/plain; version=0.0.4"
                    elif parsed.path == "/api/v1/rules":
                        payload = handle_rules(
                            outer.querier, outer.alert_rules
                        )
                    elif parsed.path == "/api/v1/query_range":
                        payload = handle_query_range(
                            outer.querier, parse_qs(parsed.query)
                        )
                    elif parsed.path == "/api/v1/query":
                        payload = handle_query(
                            outer.querier, parse_qs(parsed.query)
                        )
                    elif parsed.path.startswith("/api/v1/"):
                        payload = handle_metadata(
                            outer.querier, parsed.path, parse_qs(parsed.query)
                        )
                    else:
                        self.send_error(404)
                        return
                except ValueError as e:
                    self.send_error(404 if "unknown" in str(e) else 400,
                                    str(e)[:200])
                    return
                except Exception as e:  # noqa: BLE001
                    self.send_error(400, str(e)[:200])
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def log_message(self, *a) -> None:  # quiet
                pass

        self.querier = querier
        self.write_store = write_store
        self.spark = spark
        self.alert_rules = alert_rules
        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_port
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()


# -- remote-write receive path (beyond reference: agni vendors the
# -- WriteRequest proto but registers only /read, server.go:51-52) ----------

def decode_write(spark, body: bytes):
    """snappy+proto WriteRequest -> (samples_df, series_df).

    series_id is the deterministic 60-bit hash of the canonical sorted
    label string (the engine-side twin of tsdb's labels hash,
    labels.go:57-68) — writers on any node derive identical ids with no
    coordination, which is what makes the receive path shardable."""
    req = pb.decode_write_request(snappy.decompress(body))
    sample_rows = []
    series_rows = []
    for ts in req.timeseries:
        labels = sorted(ts.labels)
        key = ",".join(f"{n}={v}" for n, v in labels)
        sid = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        series_rows.append((sid, dict(labels)))
        for value, t in ts.samples:
            sample_rows.append((sid, t, value))
    samples = spark.createDataFrame(
        sample_rows, "series_id long, ts_ms long, value double"
    )
    series = spark.createDataFrame(
        series_rows, "series_id long, labels map<string,string>"
    )
    return samples, series


def handle_write(spark, body: bytes, store_path: str, block_ms: int = 7_200_000):
    """POST /write: land the request's samples into the time-partitioned
    block store (append), then refresh the registry (commit-last). The
    series dim appends too; readers dedupe on series_id — identical
    label sets always carry identical ids."""
    from agni_spark.sources import layout

    samples, series = decode_write(spark, body)
    data_path = f"{store_path}/data"
    (
        samples.withColumn("block_id", layout.block_id_col(block_ms))
        .repartition("block_id")
        .sortWithinPartitions("series_id", "ts_ms")
        .write.partitionBy("block_id")
        .mode("append")
        .parquet(data_path)
    )
    series.write.mode("append").parquet(f"{store_path}/series")
    # commit point: registry reflects the appended data (marker-last)
    layout.refresh_registry(spark, store_path, block_ms)
    return samples.count()


# -- PromQL query API (beyond reference: upstream Prometheus's job) ---------

def eval_promql(
    querier: Querier,
    expr_text: str,
    start_ms: int | None = None,
    end_ms: int | None = None,
    step_ms: int | None = None,
) -> dict:
    """Evaluate a PromQL expression and shape the result like
    Prometheus's /api/v1/query_range response (resultType matrix).
    The collect() is at the serving edge; evaluation is one Catalyst
    plan via promql_parser.

    When `step` divides the range window and the expression is a bare
    over_time function, evaluation is SLIDING (window > step), matching
    Prometheus's independent step/window semantics; otherwise the step
    is the window (tumbling)."""
    from agni_spark import promql_parser as pql
    from agni_spark.functions import promql as pf

    expr = pql.parse(expr_text)
    _SLIDING = {
        "sum_over_time": "sum_value",
        "avg_over_time": "avg_value",
        "count_over_time": "n",
        "min_over_time": "min_value",
        "max_over_time": "max_value",
        "last_over_time": "last_value",
    }
    if (
        step_ms
        and isinstance(expr, pql.Func)
        and expr.name in _SLIDING
        and expr.arg.range_ms
        and expr.arg.range_ms != step_ms
        and expr.arg.range_ms % step_ms == 0
    ):
        sel = pql.compile_expr(expr.arg, querier, start_ms, end_ms)
        sl = pf.range_agg_sliding(sel, expr.arg.range_ms, step_ms)
        df = sl.select(
            "series_id",
            F.col("wstart_ms").alias("bucket_ms"),
            F.col(_SLIDING[expr.name]).cast("double").alias("value"),
        )
    else:
        df = pql.compile_expr(expr, querier, start_ms, end_ms)
    cols = df.columns
    tcol = "ts_ms" if "ts_ms" in cols else (
        "bucket_ms" if "bucket_ms" in cols else None
    )
    label_cols = [c for c in cols if c not in (tcol, "value", "rk")]
    if label_cols == ["series_id"]:
        # resolve series ids to label sets
        df = df.join(querier.series, "series_id")
        label_cols = [c for c in querier.series.columns if c != "series_id"]
    order = (label_cols + [tcol]) if tcol else label_cols
    rows = df.orderBy(*order).collect()
    result: list[dict] = []
    current_key, current = None, None
    for r in rows:
        key = tuple((c, r[c]) for c in label_cols if r[c] is not None)
        if key != current_key:
            current = {"metric": dict(key), "values": []}
            result.append(current)
            current_key = key
        t = r[tcol] if tcol else (end_ms or 0)
        current["values"].append([t / 1000.0, str(r["value"])])
    return {
        "status": "success",
        "data": {"resultType": "matrix", "result": result},
    }


def handle_query_range(querier: Querier, params: dict) -> bytes:
    """GET /api/v1/query_range?query=...&start=...&end=... (seconds,
    like Prometheus). Returns the JSON body."""
    import json

    expr = params["query"][0]
    start_ms = (
        int(float(params["start"][0]) * 1000) if "start" in params else None
    )
    end_ms = int(float(params["end"][0]) * 1000) if "end" in params else None
    step_ms = (
        int(float(params["step"][0]) * 1000) if "step" in params else None
    )
    try:
        body = eval_promql(querier, expr, start_ms, end_ms, step_ms)
    except ValueError as e:
        body = {"status": "error", "errorType": "bad_data", "error": str(e)}
    return json.dumps(body).encode()


# -- metadata API (label_names / label_values / series: querier M4/M5/S6) ---

def _parse_selector_matchers(param_values: list[str]) -> list[Matcher]:
    """Parse repeated match[] params ('{job=\"api\",env!=\"dev\"}' or a
    bare metric name) into engine matchers via the PromQL parser."""
    from agni_spark import promql_parser as pql

    out: list[Matcher] = []
    for text in param_values:
        sel = pql.parse(text)
        if not isinstance(sel, pql.Selector):
            raise ValueError(f"match[] must be a selector: {text!r}")
        ms = list(sel.matchers)
        if sel.metric is not None:
            ms.append(Matcher("=", "__name__", sel.metric))
        out.extend(ms)
    return out


def handle_metadata(querier: Querier, path: str, params: dict) -> bytes:
    """GET /api/v1/labels | /api/v1/label/<name>/values |
    /api/v1/series?match[]=... — JSON bodies in Prometheus's shape."""
    import json
    import re as _re

    matchers = _parse_selector_matchers(params.get("match[]", []))
    if path == "/api/v1/status/tsdb":
        top = (
            querier.series_labels.groupBy("name", "value")
            .agg(F.countDistinct("series_id").alias("n"))
            .orderBy(F.col("n").desc(), "name", "value")
            .limit(10)
            .collect()
        )
        n_series = querier.series.count()
        data = {
            "numSeries": n_series,
            "seriesCountByLabelValuePair": [
                {"name": f"{r.name}={r.value}", "value": r.n} for r in top
            ],
        }
    elif path == "/api/v1/labels":
        data = [r.name for r in querier.label_names(matchers).collect()]
    elif path == "/api/v1/series":
        label_cols = [c for c in querier.series.columns if c != "series_id"]
        rows = querier.series_for(matchers).collect()
        data = []
        for r in rows:
            d = {}
            for c in label_cols:
                if r[c] is not None:
                    d["__name__" if c == "metric" else c] = r[c]
            data.append(d)
    else:
        m = _re.fullmatch(r"/api/v1/label/([^/]+)/values", path)
        if not m:
            raise ValueError(f"unknown metadata path {path!r}")
        data = [r.value for r in querier.label_values(m.group(1), matchers).collect()]
    return json.dumps({"status": "success", "data": data}).encode()


def eval_instant(
    querier: Querier,
    expr_text: str,
    time_ms: int,
    lookback_ms: int = 300_000,
) -> dict:
    """GET /api/v1/query evaluation: instant vector at `time_ms` with
    Prometheus staleness lookback — supports selectors and label
    aggregations over them."""
    from agni_spark import promql_parser as pql
    from agni_spark.functions import promql as pf

    expr = pql.parse(expr_text)

    def instant_of(sel: "pql.Selector"):
        if sel.range_ms is not None:
            raise ValueError("instant query takes an instant selector")
        ms = list(sel.matchers)
        if sel.metric is not None:
            ms.append(Matcher("=", "__name__", sel.metric))
        return pf.instant(querier.select(ms), time_ms, lookback_ms)

    label_cols = [c for c in querier.series.columns if c != "series_id"]
    if isinstance(expr, pql.Selector):
        df = instant_of(expr).join(querier.series, "series_id")
        keys = label_cols
        val = "value"
    elif isinstance(expr, pql.Agg) and isinstance(expr.arg, pql.Selector):
        inner = instant_of(expr.arg)
        if expr.mode == "by":
            keys = [l for l in expr.labels if l in label_cols]
        elif expr.mode == "without":
            keys = [c for c in label_cols if c not in set(expr.labels)]
        else:
            keys = []
        dim = F.broadcast(querier.series.select("series_id", *keys))
        aggs = {
            "sum": F.round(F.sum("value"), 4),
            "avg": F.round(F.avg("value"), 6),
            "min": F.min("value"),
            "max": F.max("value"),
            "count": F.count(F.lit(1)).cast("double"),
        }
        df = inner.join(dim, "series_id").groupBy(*keys).agg(
            aggs[expr.op].alias("value")
        )
        val = "value"
    else:
        raise ValueError(
            "instant query supports selectors and label aggregations"
        )
    rows = df.orderBy(*keys).collect() if keys else df.collect()
    result = []
    for r in rows:
        metric = {}
        for c in keys:
            if r[c] is not None:
                metric["__name__" if c == "metric" else c] = r[c]
        result.append(
            {"metric": metric, "value": [time_ms / 1000.0, str(r[val])]}
        )
    return {
        "status": "success",
        "data": {"resultType": "vector", "result": result},
    }


def handle_query(querier: Querier, params: dict) -> bytes:
    """GET /api/v1/query?query=...&time=... (seconds)."""
    import json

    expr = params["query"][0]
    time_ms = int(float(params["time"][0]) * 1000)
    try:
        body = eval_instant(querier, expr, time_ms)
    except ValueError as e:
        body = {"status": "error", "errorType": "bad_data", "error": str(e)}
    return json.dumps(body).encode()


def handle_federate(querier: Querier, params: dict) -> bytes:
    """GET /federate?match[]=... — Prometheus's federation endpoint:
    the LATEST sample of every matching series, as exposition text
    (scrapeable by another Prometheus; the inverse of our exposition
    ingest). Evaluation is one Catalyst plan: matcher select, per-
    series argmax-ts, series labels re-assembled into a map and
    formatted by protocol.exposition.format_exposition. The collect is
    the serving edge writing the HTTP body."""
    from pyspark.sql import Window

    from agni_spark.protocol.exposition import format_exposition

    matchers = _parse_selector_matchers(params.get("match[]", []))
    if not matchers:
        raise ValueError("federate requires at least one match[]")
    sel = querier.select(matchers, sort=False)
    w = Window.partitionBy("series_id").orderBy(
        F.col("ts_ms").desc(), F.col("value").desc()
    )
    latest = (
        sel.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("series_id", "ts_ms", "value")
    )
    lbls = (
        querier.series_labels.groupBy("series_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("name", "value")))
            ).alias("labels")
        )
    )
    lines = format_exposition(latest, lbls)
    body = "\n".join(r.line for r in lines.collect())
    return (body + "\n").encode() if body else b""


def handle_rules(
    querier: Querier, alert_rules: list[dict] | None
) -> bytes:
    """GET /api/v1/rules — evaluate the server's configured alerting
    rules and report each alert element's CURRENT state (the
    Prometheus rules API shape, evaluated on demand: condition vector
    on the rule's step grid -> `for:` run-length check -> the LATEST
    step decides firing/pending; an element with no current row is
    inactive and alerts list only active elements).

    Each rule: {"name", "expr", "for_ms" (0 = fire immediately),
    "step_ms"}. Evaluation is one Catalyst plan per rule; the collect
    is the serving edge building the JSON body."""
    import json

    from agni_spark import promql_parser as pql
    from agni_spark.functions import promql as pf

    groups = []
    for rule in alert_rules or []:
        step_ms = int(rule.get("step_ms", 3_600_000))
        for_ms = int(rule.get("for_ms", 0))
        cond = pql.query(querier, rule["expr"], step_ms=step_ms)
        keys = [
            c for c in cond.columns if c not in ("bucket_ms", "value")
        ]
        has_grid = "bucket_ms" in cond.columns
        if for_ms > 0 and has_grid:
            st = pf.alert_for_state(cond, keys, for_ms, step_ms)
        else:
            # instant-shaped condition (no step grid) or for: 0 —
            # any present element is immediately firing
            st = cond.withColumn("state", F.lit("firing"))
        if has_grid:
            from pyspark.sql import Window

            w = Window.partitionBy(*keys).orderBy(F.col("bucket_ms").desc())
            latest = (
                st.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
            )
        else:
            latest = st.withColumn("bucket_ms", F.lit(None).cast("long"))
        alerts = []
        for r in latest.collect():  # serving edge
            alerts.append(
                {
                    "labels": {
                        k: r[k] for k in keys if r[k] is not None
                    },
                    "state": r["state"],
                    "value": r["value"],
                    "activeAt_ms": r["bucket_ms"],
                }
            )
        state = (
            "firing"
            if any(a["state"] == "firing" for a in alerts)
            else ("pending" if alerts else "inactive")
        )
        groups.append(
            {
                "name": rule["name"],
                "query": rule["expr"],
                "duration_ms": for_ms,
                "state": state,
                "alerts": alerts,
            }
        )
    return json.dumps(
        {
            "status": "success",
            "data": {"groups": [{"name": "default", "rules": groups}]},
        }
    ).encode()

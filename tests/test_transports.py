"""K1/K2 transport clients against in-process fake servers: a minimal MQTT
3.1.1 broker (CONNECT/CONNACK, PUBLISH parse, PUBACK for QoS 1) and an
InfluxDB /write endpoint. Verifies the wire format end to end — the
formatters themselves are column expressions tested via the oracle gate."""

from __future__ import annotations

import socket
import struct
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pyspark.sql.functions as F

from detector_network_processor_spark.streaming.sinks import l1_influx_points, l1_text_lines
from detector_network_processor_spark.streaming.transports import (
    InfluxWriter,
    MqttPublisher,
    influx_foreach_batch,
    mqtt_foreach_batch,
)


class FakeBroker(threading.Thread):
    """Accepts one client; records (topic, payload, qos) per PUBLISH."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.published: list[tuple[str, bytes, int]] = []
        self.connected = False

    def run(self):
        conn, _ = self.sock.accept()
        with conn:
            while True:
                head = conn.recv(1)
                if not head:
                    return
                ptype = head[0]
                length, mult = 0, 1
                while True:
                    b = conn.recv(1)[0]
                    length += (b & 0x7F) * mult
                    if not b & 0x80:
                        break
                    mult *= 128
                body = b""
                while len(body) < length:
                    body += conn.recv(length - len(body))
                kind = ptype & 0xF0
                if kind == 0x10:  # CONNECT
                    self.connected = True
                    conn.sendall(bytes([0x20, 2, 0, 0]))
                elif kind == 0x30:  # PUBLISH
                    qos = (ptype >> 1) & 0x3
                    tlen = struct.unpack(">H", body[:2])[0]
                    topic = body[2 : 2 + tlen].decode()
                    rest = body[2 + tlen :]
                    if qos:
                        pid, rest = rest[:2], rest[2:]
                        conn.sendall(bytes([0x40, 2]) + pid)
                    self.published.append((topic, rest, qos))
                elif kind == 0xE0:  # DISCONNECT
                    return


class FakeReplayBroker(threading.Thread):
    """Accepts one subscriber: CONNACK, SUBACK, then replays a canned
    (topic, payload, qos) stream as PUBLISH packets and drains acks."""

    def __init__(self, messages):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.messages = messages
        self.subscribed_filter = None

    @staticmethod
    def _read_pkt(conn):
        head = conn.recv(1)
        if not head:
            return None, b""
        length, mult = 0, 1
        while True:
            b = conn.recv(1)[0]
            length += (b & 0x7F) * mult
            if not b & 0x80:
                break
            mult *= 128
        body = b""
        while len(body) < length:
            body += conn.recv(length - len(body))
        return head[0], body

    def run(self):
        conn, _ = self.sock.accept()
        with conn:
            while True:
                ptype, body = self._read_pkt(conn)
                if ptype is None:
                    return
                kind = ptype & 0xF0
                if kind == 0x10:  # CONNECT
                    conn.sendall(bytes([0x20, 2, 0, 0]))
                elif kind == 0x80:  # SUBSCRIBE
                    pid = body[:2]
                    flen = struct.unpack(">H", body[2:4])[0]
                    self.subscribed_filter = body[4 : 4 + flen].decode()
                    qos = body[4 + flen]
                    conn.sendall(bytes([0x90, 3]) + pid + bytes([qos]))
                    for i, (topic, payload, mqos) in enumerate(self.messages):
                        t = topic.encode()
                        vh = struct.pack(">H", len(t)) + t
                        if mqos:
                            vh += struct.pack(">H", i + 1)
                        pkt_body = vh + payload
                        conn.sendall(
                            bytes([0x30 | (mqos << 1)])
                            + _encode_len(len(pkt_body))
                            + pkt_body
                        )
                    # drain PUBACKs / DISCONNECT until the client goes away
                    conn.settimeout(5)
                    try:
                        while True:
                            p, _ = self._read_pkt(conn)
                            if p is None or p & 0xF0 == 0xE0:
                                return
                    except (socket.timeout, OSError):
                        return


def _encode_len(n: int) -> bytes:
    out = bytearray()
    while True:
        byte = n % 128
        n //= 128
        out.append(byte | (0x80 if n else 0))
        if not n:
            return bytes(out)


class FakeInflux(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers["Content-Length"])
                outer.requests.append((self.path, self.rfile.read(n)))
                self.send_response(204)
                self.end_headers()

            def log_message(self, *a):
                pass

        self.requests: list[tuple[str, bytes]] = []
        self.httpd = HTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]

    def run(self):
        self.httpd.handle_request()


def _flat_l1(spark):
    rows = [
        ("00AA", 10, 20, 2, False, 1, 0, 5, 12, 30, 400),
        ("00AA", 10, 20, 2, False, 1, 1, 7, 18, 40, 500),
    ]
    cols = ["uuid", "group_start", "group_end", "n", "conflicting", "true_e",
            "pos", "hash", "start", "end", "time_acc"]
    return spark.createDataFrame(rows, cols)


def test_mqtt_publish_qos0_and_qos1(spark):
    broker = FakeBroker()
    broker.start()
    pub = MqttPublisher("127.0.0.1", broker.port, client_id="test")
    lines = [r["line"] for r in l1_text_lines(_flat_l1(spark)).collect()]
    assert pub.publish_lines("muonpi/l1", lines, qos=0) == 2
    pub.publish("muonpi/l1", "qos1-line", qos=1)  # blocks until PUBACK
    pub.close()
    broker.join(timeout=5)
    assert broker.connected
    topics = {t for t, _, _ in broker.published}
    assert topics == {"muonpi/l1"}
    payloads = [p.decode() for _, p, _ in broker.published]
    assert payloads[:2] == lines and payloads[2] == "qos1-line"
    assert [q for _, _, q in broker.published] == [0, 0, 1]
    # K1 line shape: uuid pos n rel_start rel_end hash time_acc conflicting true_e
    assert lines[0].split(" ") == ["00AA", "0", "2", "2", "20", "5", "400", "0", "1"]


def test_influx_write_lines(spark):
    srv = FakeInflux()
    srv.start()
    writer = InfluxWriter("127.0.0.1", srv.port, database="muonpi")
    points = [r["point"] for r in l1_influx_points(_flat_l1(spark)).collect()]
    assert writer.write_lines(points) == 2
    srv.join(timeout=5)
    path, body = srv.requests[0]
    assert path.startswith("/write?") and "db=muonpi" in path and "precision=ns" in path
    got = body.decode().split("\n")
    assert got == points
    assert got[0].startswith("L1Event,hash=5 uuid=") and got[0].endswith(" 12")


def test_foreach_batch_adapters(spark):
    broker = FakeBroker()
    broker.start()
    srv = FakeInflux()
    srv.start()
    flat = _flat_l1(spark)
    pub = MqttPublisher("127.0.0.1", broker.port)
    mqtt_foreach_batch(pub, "muonpi/l1")(l1_text_lines(flat), 0)
    pub.close()
    influx_foreach_batch(InfluxWriter("127.0.0.1", srv.port))(l1_influx_points(flat), 0)
    broker.join(timeout=5)
    srv.join(timeout=5)
    assert len(broker.published) == 2
    assert len(srv.requests) == 1


def test_mqtt_subscribe_ingest_parse_cluster(spark, tmp_path):
    """S1 live path round trip (reference src/application.cpp:186-210): a
    replayed topic stream -> MqttSubscriber -> parquet spool -> parser ->
    coincidence clusterer. 50 two-station pairs 50 us apart must come out
    as 50 n=2 groups under the simple (100 us) criterion."""
    from detector_network_processor_spark.operators.coincidence import cluster_coincidences
    from detector_network_processor_spark.sources.lines import parse_events
    from detector_network_processor_spark.streaming.transports import (
        MqttSubscriber,
        spool_messages,
    )

    base_ns = 1_700_000_000_000_000_000
    msgs = []
    for i in range(50):
        t0 = base_ns + i * 10_000_000_000  # 10 s apart -> separate sessions
        for j, (user, st) in enumerate([("u1", "s0"), ("u2", "s0")]):
            s = t0 + j * 50_000  # 50 us apart -> inside the simple window
            e = s + 200_000
            payload = f"{s // 10**9}.{s % 10**9:09d} {e // 10**9}.{e % 10**9:09d} {100 + i} {i % 65536} 1 0 3"
            msgs.append((f"muonpi/data/{user}/{st}", payload.encode(), i % 2))

    broker = FakeReplayBroker(msgs)
    broker.start()
    sub = MqttSubscriber(
        "127.0.0.1", broker.port, topic_filter="muonpi/data/#", qos=1, timeout_s=5.0
    )
    spool = str(tmp_path / "spool")
    n = spool_messages(sub, spool, batch_size=16, max_messages=len(msgs))
    sub.close()
    broker.join(timeout=10)
    assert n == 100
    assert broker.subscribed_filter == "muonpi/data/#"

    lines = spark.read.parquet(spool)
    parsed = parse_events(lines)
    rows = parsed.orderBy("start").collect()
    assert len(rows) == 100
    assert rows[0].start == base_ns and rows[0].username == "u1"
    assert rows[1].start == base_ns + 50_000 and rows[1].username == "u2"

    dim = spark.createDataFrame(
        [("u1", "s0", 47.0, 8.0, 450.0), ("u2", "s0", 47.001, 8.0, 450.0)],
        "username string, station_id string, lat double, lon double, h double",
    )
    import pyspark.sql.functions as F

    enriched = parsed.join(
        F.broadcast(dim), ["username", "station_id"]
    ).select("hash", "start", "end", "time_acc", "ublox_counter", "fix", "lat", "lon", "h")
    l1 = cluster_coincidences(enriched, stations=None, criterion="simple")
    groups = l1.filter(F.col("n") >= 2).collect()
    assert len(groups) == 50
    assert all(g.n == 2 and not g.conflicting for g in groups)


def test_non_l1_formatter_round_trip(spark):
    """K1/K2 round trip for the non-L1 message types (mqtt.h:128-146,
    database.h:95-113): detector_summary text lines out through the MQTT
    publisher, summary + trigger points out through the Influx writer."""
    from detector_network_processor_spark.streaming.sinks import (
        summary_influx_points,
        summary_text_lines,
        trigger_influx_points,
        trigger_text_lines,
    )

    summary = spark.createDataFrame(
        [(5, 2, 10, 12, 0.166667, 123.5, 700.25, 0.25, 0.433013, "u5", "s5", 240_000_000)],
        "hash long, win long, incoming long, ublox_counter_progress long, "
        "deadtime double, mean_pulselength double, mean_time_acc double, "
        "rate_mean double, rate_std double, user string, station_id string, ts_us long",
    )
    lines = [r["line"] for r in summary_text_lines(summary).orderBy("idx").collect()]
    assert lines[0] == "1970-01-01_00-04-00 u5 s5 eventrate 0.250000"
    assert lines[4] == "1970-01-01_00-04-00 u5 s5 incoming 10"
    assert lines[5] == "1970-01-01_00-04-00 u5 s5 ublox_counter_progess 12"  # sic, mqtt.h:143
    assert lines[6] == "1970-01-01_00-04-00 u5 s5 deadtime_factor 0.166667"

    broker = FakeBroker()
    broker.start()
    pub = MqttPublisher("127.0.0.1", broker.port)
    mqtt_foreach_batch(pub, "muonpi/summary")(summary_text_lines(summary), 0)
    pub.close()
    broker.join(timeout=5)
    assert sorted(p.decode() for _, p, _ in broker.published) == sorted(lines)

    point = summary_influx_points(summary).collect()[0]["point"]
    assert point == (
        "detector_summary,user=u5,detector=s5,site_id=u5s5 "
        "eventrate=0.250000,eventrate_stddev=0.433013,time_acc=700.250000,"
        "pulselength=123.500000,incoming=10i,ublox_counter_progress=12i,"
        "deadtime_factor=0.166667 240000000000"
    )

    tr = spark.createDataFrame(
        [(5, 240_000_000_000, "reliable", "miscellaneous", "u5", "s5")],
        "hash long, ts long, status string, reason string, user string, station_id string",
    )
    assert trigger_text_lines(tr).collect()[0]["line"] == (
        "1970-01-01_00-04-00 GMT reliable miscellaneous"
    )
    srv = FakeInflux()
    srv.start()
    influx_foreach_batch(InfluxWriter("127.0.0.1", srv.port))(trigger_influx_points(tr), 0)
    srv.join(timeout=5)
    body = srv.requests[0][1].decode()
    assert body == (
        'trigger,user=u5,detector=s5,site_id=u5s5 '
        'type="reliable",reason="miscellaneous" 240000000000'
    )

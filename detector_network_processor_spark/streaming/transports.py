"""Network transports for the K1/K2 sinks (SURVEY.md §2.9).

The reference publishes L1 lines over MQTT (include/source/mqtt.h:386-433,
include/sink/mqtt.h:146-184) and writes points to InfluxDB over its HTTP
line-protocol endpoint (include/sink/database.h:56-190). The engine keeps
the FORMATTERS in the data plane (streaming/sinks.py — pure column
expressions, oracle-testable) and pairs them here with minimal stdlib
transport clients, so a `foreachBatch` drain can actually deliver:

- ``MqttPublisher`` — MQTT 3.1.1 over a TCP socket: CONNECT/CONNACK,
  PUBLISH at QoS 0 or 1 (PUBACK-acknowledged), DISCONNECT. No external
  client library (none is available in this environment); the packet layer
  is the public OASIS wire format.
- ``InfluxWriter`` — line-protocol batches POSTed to ``/write?db=...``
  via ``http.client``.

Both are driver-side objects used from ``foreachBatch`` callbacks (the
reference's sink threads are likewise outside its analysis data plane).
Per-executor fan-out at scale would wrap the same classes in
``mapPartitions``; the driver-side drain matches the reference's single
publisher socket.
"""

from __future__ import annotations

import http.client
import socket
import struct
import urllib.parse

# MQTT 3.1.1 control packet types (public OASIS spec, section 2.2.1)
_CONNECT, _CONNACK, _PUBLISH, _PUBACK, _DISCONNECT = 0x10, 0x20, 0x30, 0x40, 0xE0


def _encode_remaining_length(n: int) -> bytes:
    """MQTT variable-length remaining-length encoding (spec 2.2.3)."""
    out = bytearray()
    while True:
        byte = n % 128
        n //= 128
        out.append(byte | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _decode_remaining_length(read_byte) -> int:
    mult, value = 1, 0
    for _ in range(4):
        b = read_byte()
        value += (b & 0x7F) * mult
        if not b & 0x80:
            return value
        mult *= 128
    raise ValueError("malformed remaining length")


def _utf8(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


class MqttPublisher:
    """Minimal MQTT 3.1.1 publishing client (QoS 0/1), blocking socket."""

    def __init__(self, host: str, port: int = 1883, client_id: str = "dnp-spark",
                 keepalive_s: int = 60, timeout_s: float = 10.0):
        self._sock = socket.create_connection((host, port), timeout=timeout_s)
        self._packet_id = 0
        var_header = _utf8("MQTT") + bytes([4]) + bytes([0x02]) + struct.pack(">H", keepalive_s)
        payload = _utf8(client_id)
        self._send(_CONNECT, var_header + payload)
        ack = self._read_packet()
        if ack[0] != _CONNACK or ack[1][1] != 0:
            raise ConnectionError(f"CONNACK refused: {ack[1]!r}")

    def publish(self, topic: str, payload: str | bytes, qos: int = 0) -> None:
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        flags = qos << 1
        var_header = _utf8(topic)
        if qos:
            self._packet_id = self._packet_id % 0xFFFF + 1
            var_header += struct.pack(">H", self._packet_id)
        self._send(_PUBLISH | flags, var_header + payload)
        if qos:
            ptype, body = self._read_packet()
            if ptype != _PUBACK or struct.unpack(">H", body[:2])[0] != self._packet_id:
                raise ConnectionError("PUBACK missing or out of order")

    def publish_lines(self, topic: str, lines, qos: int = 0) -> int:
        """Drain an iterable of text lines; returns the publish count."""
        n = 0
        for line in lines:
            self.publish(topic, line, qos=qos)
            n += 1
        return n

    def close(self) -> None:
        try:
            self._send(_DISCONNECT, b"")
        finally:
            self._sock.close()

    def _send(self, header: int, body: bytes) -> None:
        self._sock.sendall(bytes([header]) + _encode_remaining_length(len(body)) + body)

    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("socket closed")
            buf += chunk
        return buf

    def _read_packet(self) -> tuple[int, bytes]:
        header = self._read_exact(1)[0]
        length = _decode_remaining_length(lambda: self._read_exact(1)[0])
        return header & 0xF0, self._read_exact(length)


class InfluxWriter:
    """InfluxDB 1.x line-protocol writer over HTTP (database.h:56-190)."""

    def __init__(self, host: str, port: int = 8086, database: str = "muonpi",
                 precision: str = "ns", timeout_s: float = 10.0):
        self._host, self._port, self._timeout = host, port, timeout_s
        self._query = urllib.parse.urlencode({"db": database, "precision": precision})

    def write_lines(self, lines) -> int:
        body = "\n".join(lines).encode("utf-8")
        if not body:
            return 0
        conn = http.client.HTTPConnection(self._host, self._port, timeout=self._timeout)
        try:
            conn.request("POST", f"/write?{self._query}", body,
                         {"Content-Type": "text/plain; charset=utf-8"})
            resp = conn.getresponse()
            resp.read()
            if resp.status >= 300:
                raise ConnectionError(f"influx write failed: HTTP {resp.status}")
        finally:
            conn.close()
        return body.count(b"\n") + 1


def mqtt_foreach_batch(publisher: MqttPublisher, topic: str, column: str = "line", qos: int = 0):
    """foreachBatch callback: drain a formatted-line DataFrame to MQTT."""

    def handle(batch_df, batch_id: int) -> None:
        publisher.publish_lines(topic, (r[column] for r in batch_df.collect()), qos=qos)

    return handle


def influx_foreach_batch(writer: InfluxWriter, column: str = "point"):
    """foreachBatch callback: drain formatted points to InfluxDB."""

    def handle(batch_df, batch_id: int) -> None:
        writer.write_lines([r[column] for r in batch_df.collect()])

    return handle

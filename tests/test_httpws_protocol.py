"""RFC 6455 protocol-level tests of the stdlib WebSocket server: handshake,
masked/fragmented client frames, ping/pong, close echo, 16-bit length
frames — driven over a raw socket (no client library hiding the framing)."""

import asyncio
import base64
import hashlib
import json
import os
import socket
import struct
import threading

import pytest

from fav_tpu.serving.httpws import HttpServer, Response

WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


@pytest.fixture()
def echo_server():
    """HttpServer with a WS echo route running in a thread."""
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    loop = asyncio.new_event_loop()
    started = threading.Event()
    stop = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def serve():
            server = HttpServer()

            async def echo(request, ws):
                while True:
                    text = await ws.receive_text()
                    await ws.send_text("echo:" + text)

            server.ws("/echo", echo)

            async def hello(request):
                return Response.json({"hi": True})

            server.route("GET", "/hello", hello)
            s = await server.serve("127.0.0.1", port)
            started.set()
            while not stop.is_set():
                await asyncio.sleep(0.05)
            s.close()
            await s.wait_closed()

        loop.run_until_complete(serve())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(5)
    yield port
    stop.set()
    t.join(timeout=5)
    loop.close()


def _handshake(port, path="/echo"):
    s = socket.create_connection(("127.0.0.1", port), timeout=5)
    key = base64.b64encode(os.urandom(16)).decode()
    s.sendall(
        (
            f"GET {path} HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    head = b""
    while b"\r\n\r\n" not in head:
        head += s.recv(4096)
    expect = base64.b64encode(hashlib.sha1((key + WS_GUID).encode()).digest()).decode()
    assert b"101" in head.split(b"\r\n")[0]
    assert expect.encode() in head  # RFC 6455 accept-key derivation
    return s


def _mask_frame(opcode, payload, fin=True):
    mask = os.urandom(4)
    masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    head = bytes([(0x80 if fin else 0) | opcode])
    n = len(payload)
    if n < 126:
        head += bytes([0x80 | n])
    elif n < 1 << 16:
        head += bytes([0x80 | 126]) + struct.pack(">H", n)
    else:
        head += bytes([0x80 | 127]) + struct.pack(">Q", n)
    return head + mask + masked


def _read_frame(s):
    head = s.recv(2)
    fin = bool(head[0] & 0x80)
    opcode = head[0] & 0x0F
    length = head[1] & 0x7F
    if length == 126:
        length = struct.unpack(">H", s.recv(2))[0]
    elif length == 127:
        length = struct.unpack(">Q", s.recv(8))[0]
    payload = b""
    while len(payload) < length:
        payload += s.recv(length - len(payload))
    return fin, opcode, payload


def test_handshake_and_echo(echo_server):
    s = _handshake(echo_server)
    s.sendall(_mask_frame(0x1, b"hello"))
    fin, op, payload = _read_frame(s)
    assert (fin, op, payload) == (True, 0x1, b"echo:hello")
    s.close()


def test_fragmented_message(echo_server):
    """text split over 3 continuation frames must reassemble."""
    s = _handshake(echo_server)
    s.sendall(_mask_frame(0x1, b"one-", fin=False))
    s.sendall(_mask_frame(0x0, b"two-", fin=False))
    s.sendall(_mask_frame(0x0, b"three", fin=True))
    _, _, payload = _read_frame(s)
    assert payload == b"echo:one-two-three"
    s.close()


def test_ping_gets_pong(echo_server):
    s = _handshake(echo_server)
    s.sendall(_mask_frame(0x9, b"beat"))
    fin, op, payload = _read_frame(s)
    assert (op, payload) == (0xA, b"beat")
    s.close()


def test_ping_interleaved_with_fragments(echo_server):
    """control frames may arrive between fragments (RFC 6455 §5.4)."""
    s = _handshake(echo_server)
    s.sendall(_mask_frame(0x1, b"a", fin=False))
    s.sendall(_mask_frame(0x9, b"p"))  # ping mid-message
    s.sendall(_mask_frame(0x0, b"b", fin=True))
    frames = [_read_frame(s), _read_frame(s)]
    ops = {op: payload for _, op, payload in frames}
    assert ops[0xA] == b"p"
    assert ops[0x1] == b"echo:ab"
    s.close()


def test_large_frame_16bit_length(echo_server):
    s = _handshake(echo_server)
    payload = b"x" * 40_000  # forces the 126 + uint16 length form
    s.sendall(_mask_frame(0x1, payload))
    _, op, out = _read_frame(s)
    assert op == 0x1 and out == b"echo:" + payload
    s.close()


def test_close_echo(echo_server):
    s = _handshake(echo_server)
    s.sendall(_mask_frame(0x8, struct.pack(">H", 1000)))
    fin, op, payload = _read_frame(s)
    assert op == 0x8
    assert struct.unpack(">H", payload[:2])[0] == 1000
    s.close()


def test_404_websocket_path(echo_server):
    s = socket.create_connection(("127.0.0.1", echo_server), timeout=5)
    s.sendall(
        b"GET /nope HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
        b"Connection: Upgrade\r\nSec-WebSocket-Key: dGVzdA==\r\n\r\n"
    )
    head = s.recv(4096)
    assert b"404" in head.split(b"\r\n")[0]
    s.close()


def test_http_keepalive_two_requests(echo_server):
    """two HTTP requests over one connection (keep-alive)."""
    s = socket.create_connection(("127.0.0.1", echo_server), timeout=5)
    req = b"GET /hello HTTP/1.1\r\nHost: x\r\n\r\n"
    for _ in range(2):
        s.sendall(req)
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += s.recv(4096)
        head, _, body = buf.partition(b"\r\n\r\n")
        length = int([l for l in head.split(b"\r\n") if b"Content-Length" in l][0].split(b":")[1])
        while len(body) < length:
            body += s.recv(4096)
        assert json.loads(body) == {"hi": True}
    s.close()


def test_slow_body_times_out(echo_server, monkeypatch):
    """A client that declares a Content-Length but trickles the body must be
    disconnected once the body budget expires (Slowloris guard, body edition;
    round-1 ADVICE: only the header read was guarded)."""
    import time

    from fav_tpu.serving import httpws

    monkeypatch.setattr(httpws, "_BODY_TIMEOUT_BASE", 0.3)
    s = socket.create_connection(("127.0.0.1", echo_server), timeout=5)
    s.sendall(
        b"POST /hello HTTP/1.1\r\nHost: x\r\nContent-Length: 1000\r\n\r\npartial"
    )
    t0 = time.time()
    s.settimeout(5)
    # server must close the connection without us ever finishing the body
    buf = s.recv(4096)
    assert buf == b"", f"expected disconnect, got {buf[:80]!r}"
    assert time.time() - t0 < 4.0
    s.close()


def test_bad_content_length_rejected(echo_server):
    s = socket.create_connection(("127.0.0.1", echo_server), timeout=5)
    s.sendall(b"POST /hello HTTP/1.1\r\nHost: x\r\nContent-Length: banana\r\n\r\n")
    s.settimeout(5)
    assert s.recv(4096) == b""  # malformed framing -> connection dropped
    s.close()


def test_fuzz_garbage_bytes_leave_server_alive(echo_server):
    """Random garbage, truncated requests and malformed upgrade headers must
    never take the listener down — every probe is followed by a clean
    request that must still succeed."""
    import random

    rnd = random.Random(0xFA5)
    probes = [
        b"\x00\xff\xfe\xfd" * 64,
        b"GET\r\n\r\n",
        b"GET / HTTP/1.1\r\nContent-Length: -5\r\n\r\n",
        b"POST /hello HTTP/1.1\r\nHost: x\r\nTransfer-Encoding: chunked\r\n\r\nzz",
        b"GET /hello HTTP/1.1\r\n" + b"X-Pad: " + b"A" * 70000 + b"\r\n\r\n",  # header overflow
        b"GET /echo HTTP/1.1\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n\r\n",  # no key
        bytes(rnd.getrandbits(8) for _ in range(512)),
    ]
    for probe in probes:
        s = socket.create_connection(("127.0.0.1", echo_server), timeout=5)
        try:
            s.sendall(probe)
            s.settimeout(1.0)
            try:
                s.recv(4096)
            except socket.timeout:
                pass
        finally:
            s.close()
        # listener must still serve a clean request
        s2 = socket.create_connection(("127.0.0.1", echo_server), timeout=5)
        s2.sendall(b"GET /hello HTTP/1.1\r\nHost: x\r\n\r\n")
        buf = b""
        s2.settimeout(5)
        while b"\r\n\r\n" not in buf:
            buf += s2.recv(4096)
        assert b"200" in buf.split(b"\r\n")[0], (probe[:40], buf[:80])
        s2.close()


def test_ws_connection_churn_no_leak(echo_server):
    """200 connect/exchange/disconnect cycles: the runtime must not leak
    connection state (observable as slowdown or refusal near the end)."""
    for i in range(200):
        s = _handshake(echo_server)
        s.sendall(_mask_frame(0x1, b"m%d" % i))
        fin, op, payload = _read_frame(s)
        assert payload == b"echo:m%d" % i
        s.close()

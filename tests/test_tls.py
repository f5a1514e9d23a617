"""TLS channel security on the TCP transport.

The reference encrypts all party traffic with TLS over QUIC
(`network/quic.rs:42-73`, permissive verifier `network/config.rs:14-73`);
`TcpTransport` defaults to TLS 1.3 with an ephemeral self-signed server
cert and a `CERT_NONE` client (the `SkipServerVerification` analog).
"""

import socket
import threading

import pytest

from ark_mpc_tpu.fabric import tls as tlsmod
from ark_mpc_tpu.fabric.transport import TcpTransport


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_self_signed_cert_roundtrip():
    cert_pem, key_pem = tlsmod.generate_self_signed()
    assert b"BEGIN CERTIFICATE" in cert_pem
    assert b"BEGIN PRIVATE KEY" in key_pem
    # contexts build from the generated material
    tlsmod.server_context(cert_pem, key_pem)
    tlsmod.client_context()
    tlsmod.client_context(pinned_cert_pem=cert_pem)


@pytest.mark.parametrize("tls", [True, False])
def test_tcp_exchange(tls):
    """Loopback exchange in both TLS and plaintext modes; party 0 dials."""
    port = _free_port()
    result = {}

    def listener():
        t1 = TcpTransport(1, "127.0.0.1", port, timeout=30, tls=tls)
        got = t1.exchange(b"from-party-1" * 100)
        result[1] = got
        t1.close()

    th = threading.Thread(target=listener, daemon=True)
    th.start()
    t0 = TcpTransport(0, "127.0.0.1", port, timeout=30, tls=tls)
    result[0] = t0.exchange(b"from-party-0" * 100)
    th.join(timeout=30)
    t0.close()
    assert result[0] == b"from-party-1" * 100
    assert result[1] == b"from-party-0" * 100


def test_tls13_negotiated_and_frames_decrypt():
    """The channel negotiates TLS 1.3 and framed payloads survive it."""
    port = _free_port()
    secret = b"SUPER-SECRET-SHARE-BYTES" * 8
    got = {}

    def listener():
        t1 = TcpTransport(1, "127.0.0.1", port, timeout=30, tls=True)
        got["version"] = t1.sock.version()
        got["payload"] = t1.recv()
        t1.close()

    th = threading.Thread(target=listener, daemon=True)
    th.start()
    t0 = TcpTransport(0, "127.0.0.1", port, timeout=30, tls=True)
    assert t0.sock.version() == "TLSv1.3"
    t0.send(secret)
    th.join(timeout=30)
    t0.close()
    assert got["version"] == "TLSv1.3"
    assert got["payload"] == secret

"""ctypes binding for the native C++ framed transport (native/net.cpp).

Used automatically by `TcpTransport` when the shared library is built
(`python native/build.py`); IO runs outside the GIL so network flushes
overlap device compute.
"""

from __future__ import annotations

import ctypes
import os
import socket

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libarkmpcnet.so"),
    os.path.join(os.path.dirname(__file__), "libarkmpcnet.so"),
]


def _load():
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.mpcnet_connect.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                           ctypes.c_int, ctypes.c_double]
            lib.mpcnet_connect.restype = ctypes.c_int
            lib.mpcnet_send.argtypes = [ctypes.c_int, ctypes.c_char_p,
                                        ctypes.c_uint64]
            lib.mpcnet_send.restype = ctypes.c_int
            lib.mpcnet_recv_len.argtypes = [ctypes.c_int]
            lib.mpcnet_recv_len.restype = ctypes.c_int64
            lib.mpcnet_recv.argtypes = [ctypes.c_int, ctypes.c_char_p,
                                        ctypes.c_uint64]
            lib.mpcnet_recv.restype = ctypes.c_int
            lib.mpcnet_close.argtypes = [ctypes.c_int]
            return lib
    raise ImportError("libarkmpcnet.so not built (run python native/build.py)")


_lib = _load()


class NativeConn:
    """One framed duplex connection (party 0 dials, party 1 listens)."""

    def __init__(self, party_id: int, host: str, port: int, timeout: float):
        ip = socket.gethostbyname(host)
        fd = _lib.mpcnet_connect(ip.encode(), port, 1 if party_id == 1 else 0,
                                 float(timeout))
        if fd < 0:
            raise ConnectionError(
                f"native connect failed (party {party_id}, {ip}:{port})"
            )
        self.fd = fd

    def send(self, data: bytes) -> None:
        if _lib.mpcnet_send(self.fd, data, len(data)) != 0:
            raise ConnectionError("native send failed")

    def recv(self) -> bytes:
        n = _lib.mpcnet_recv_len(self.fd)
        if n < 0:
            raise ConnectionError("native recv failed")
        buf = ctypes.create_string_buffer(int(n))
        if _lib.mpcnet_recv(self.fd, buf, int(n)) != 0:
            raise ConnectionError("native recv failed")
        return buf.raw

    def close(self) -> None:
        _lib.mpcnet_close(self.fd)

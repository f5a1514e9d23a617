// Native framed TCP transport for the two-party MPC runtime.
//
// TPU-native counterpart of the reference's Rust QUIC transport
// (online-phase/src/network/quic.rs): one ordered stream per party pair,
// u64 little-endian length-prefixed binary frames, party 0 dials and party 1
// listens. Exposed via a C ABI consumed through ctypes
// (ark_mpc_tpu/fabric/native_net.py) — no pybind11 dependency.
//
// Design notes vs the Python socket fallback:
//  - sendall/recv_exact loops run without the GIL (ctypes releases it),
//    so network IO overlaps device compute in the round pipeline;
//  - TCP_NODELAY + one writev(header, payload) per frame: a round's flush
//    is a single syscall for typical sizes.

#include <arpa/inet.h>
#include <cerrno>
#include <cstdint>
#include <cstring>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <sys/uio.h>
#include <unistd.h>

namespace {

int set_common_opts(int fd, double timeout_s) {
    int one = 1;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    if (timeout_s > 0) {
        timeval tv;
        tv.tv_sec = static_cast<long>(timeout_s);
        tv.tv_usec = static_cast<long>((timeout_s - tv.tv_sec) * 1e6);
        setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
        setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof(tv));
    }
    return 0;
}

bool send_exact(int fd, const uint8_t* data, uint64_t len) {
    uint64_t off = 0;
    while (off < len) {
        ssize_t n = ::send(fd, data + off, len - off, MSG_NOSIGNAL);
        if (n <= 0) {
            if (n < 0 && (errno == EINTR)) continue;
            return false;
        }
        off += static_cast<uint64_t>(n);
    }
    return true;
}

bool recv_exact(int fd, uint8_t* data, uint64_t len) {
    uint64_t off = 0;
    while (off < len) {
        ssize_t n = ::recv(fd, data + off, len - off, 0);
        if (n <= 0) {
            if (n < 0 && (errno == EINTR)) continue;
            return false;
        }
        off += static_cast<uint64_t>(n);
    }
    return true;
}

}  // namespace

extern "C" {

// Connect (listen_mode=0 dials with retry until timeout; =1 accepts one
// connection). Returns the connected fd, or -1 on failure.
int mpcnet_connect(const char* host, int port, int listen_mode,
                   double timeout_s) {
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(static_cast<uint16_t>(port));
    if (inet_pton(AF_INET, host, &addr.sin_addr) != 1) return -1;

    if (listen_mode) {
        int srv = ::socket(AF_INET, SOCK_STREAM, 0);
        if (srv < 0) return -1;
        int one = 1;
        setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
        if (::bind(srv, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0 ||
            ::listen(srv, 1) < 0) {
            ::close(srv);
            return -1;
        }
        timeval tv;
        tv.tv_sec = static_cast<long>(timeout_s);
        tv.tv_usec = 0;
        setsockopt(srv, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
        int fd = ::accept(srv, nullptr, nullptr);
        ::close(srv);
        if (fd < 0) return -1;
        set_common_opts(fd, timeout_s);
        return fd;
    }

    // dial with retry (the listener may come up later)
    timeval start;
    gettimeofday(&start, nullptr);
    for (;;) {
        int fd = ::socket(AF_INET, SOCK_STREAM, 0);
        if (fd < 0) return -1;
        if (::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) == 0) {
            set_common_opts(fd, timeout_s);
            return fd;
        }
        ::close(fd);
        timeval now;
        gettimeofday(&now, nullptr);
        double elapsed = (now.tv_sec - start.tv_sec) +
                         (now.tv_usec - start.tv_usec) * 1e-6;
        if (elapsed > timeout_s) return -1;
        usleep(100000);
    }
}

// Send one frame (u64 LE length prefix + payload). Returns 0 on success.
int mpcnet_send(int fd, const uint8_t* data, uint64_t len) {
    uint8_t hdr[8];
    for (int i = 0; i < 8; i++) hdr[i] = (len >> (8 * i)) & 0xFF;
    iovec iov[2];
    iov[0] = {hdr, 8};
    iov[1] = {const_cast<uint8_t*>(data), static_cast<size_t>(len)};
    // try one writev; fall back to exact loops on partial writes
    ssize_t n = ::writev(fd, iov, 2);
    if (n == static_cast<ssize_t>(8 + len)) return 0;
    if (n < 0) {
        if (errno != EINTR && errno != EAGAIN) return -1;
        n = 0;
    }
    uint64_t sent = static_cast<uint64_t>(n);
    if (sent < 8) {
        if (!send_exact(fd, hdr + sent, 8 - sent)) return -1;
        sent = 8;
    }
    uint64_t poff = sent - 8;
    return send_exact(fd, data + poff, len - poff) ? 0 : -1;
}

// Read the next frame's length (blocks). Returns length, or -1 on error.
int64_t mpcnet_recv_len(int fd) {
    uint8_t hdr[8];
    if (!recv_exact(fd, hdr, 8)) return -1;
    uint64_t len = 0;
    for (int i = 0; i < 8; i++) len |= static_cast<uint64_t>(hdr[i]) << (8 * i);
    return static_cast<int64_t>(len);
}

// Read exactly len payload bytes into buf. Returns 0 on success.
int mpcnet_recv(int fd, uint8_t* buf, uint64_t len) {
    return recv_exact(fd, buf, len) ? 0 : -1;
}

void mpcnet_close(int fd) { ::close(fd); }

}  // extern "C"

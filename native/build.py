"""Build the native runtime components.

    python native/build.py

Produces native/libarkmpcnet.so (framed TCP transport).
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def build():
    targets = [("net.cpp", "libarkmpcnet.so")]
    for src, out in targets:
        cmd = [
            "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
            os.path.join(HERE, src), "-o", os.path.join(HERE, out),
        ]
        print("+", " ".join(cmd))
        subprocess.run(cmd, check=True)
    print("native build OK")


if __name__ == "__main__":
    try:
        build()
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native build failed: {e}", file=sys.stderr)
        sys.exit(1)

"""Build the native host-side library: python -m camliflow_tpu.csrc.build"""

import os
import subprocess
import sys


def main():
    src_dir = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(src_dir, "knn_fps.cpp")
    out = os.path.join(src_dir, "libknn_fps.so")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        src, "-o", out,
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print("built", out)


if __name__ == "__main__":
    sys.exit(main())

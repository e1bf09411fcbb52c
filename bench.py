#!/usr/bin/env python
"""Benchmark entry point (driver contract: prints ONE JSON line).

Default: batched DartWalker2d env-steps/s/chip on the available device(s)
— the north-star metric config (BASELINE.md config 4).
"""
import sys

from dartenv_tpu.bench.throughput import main

if __name__ == "__main__":
    main(sys.argv[1:])

"""``python -m benchmarks [sizes...]`` — run the per-op suite."""

from __future__ import annotations

import sys

from .suite import ALL


def main():
    sizes = [int(a) for a in sys.argv[1:]] or None
    print(f"{'benchmark':<28} {'nx':>6} {'time':>12}")
    print("-" * 48)
    for cls in ALL:
        bench = cls()
        if sizes is not None:
            bench.params = (list(sizes),)
        for name, nx, res in bench.run():
            if isinstance(res, Exception):
                print(f"{name:<28} {nx:>6} {type(res).__name__}: "
                      f"{str(res)[:40]}")
            else:
                print(f"{name:<28} {nx:>6} {res * 1e3:>9.2f} ms")


if __name__ == "__main__":
    main()

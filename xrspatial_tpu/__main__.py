"""Command-line entry point: ``python -m xrspatial_tpu <command>``.

Counterpart of reference ``xrspatial/__main__.py`` (which delegates to
pyct).  Supported commands: ``examples`` (list bundled datasets),
``info`` (environment/device report).
"""

from __future__ import annotations

import sys


def main(args=None):
    args = list(sys.argv[1:] if args is None else args)
    cmd = args[0] if args else "info"
    if cmd == "examples":
        from .datasets import available_datasets
        print("Available bundled datasets:")
        for name in available_datasets or ["(none bundled)"]:
            print(f"  - {name}")
        return 0
    if cmd == "info":
        import jax

        from . import __version__
        print(f"xrspatial_tpu {__version__}")
        print(f"jax {jax.__version__} backend={jax.default_backend()}")
        print(f"devices: {jax.devices()}")
        return 0
    print(f"Unknown command {cmd!r}. Available: examples, info")
    return 1


if __name__ == "__main__":
    sys.exit(main())

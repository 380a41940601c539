"""Command-line entry point: ``python -m xrspatial_tpu <command>``.

Counterpart of reference ``xrspatial/__main__.py`` (which delegates to
pyct).  Supported commands: ``examples`` (list bundled datasets),
``fetch-data [path]`` (copy bundled sample data into a working
directory, the pyct ``fetch-data`` analog — the data ships with the
package, so "fetching" is a local copy), ``info`` (environment/device
report).
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
    if cmd == "fetch-data":
        import os
        import shutil

        from .datasets import _module_path, available_datasets
        target = args[1] if len(args) > 1 else "./data"
        os.makedirs(target, exist_ok=True)
        for name in available_datasets:
            dst = os.path.join(target, name)
            shutil.copytree(os.path.join(_module_path, name), dst,
                            dirs_exist_ok=True)
            print(f"copied {name} -> {dst}")
        if not available_datasets:
            print("no bundled datasets to fetch")
        return 0
    if cmd == "info":
        import jax

        from . import __version__
        print(f"xrspatial_tpu {__version__}")
        print(f"jax {jax.__version__} backend={jax.default_backend()}")
        print(f"devices: {jax.devices()}")
        return 0
    print(f"Unknown command {cmd!r}. Available: examples, fetch-data, "
          "info")
    return 1


if __name__ == "__main__":
    sys.exit(main())

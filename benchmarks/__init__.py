"""ASV-style per-op benchmark suite (reference benchmarks/benchmarks/).

ASV itself is not a dependency here; ``python -m benchmarks`` runs every
``time_*`` method with tunnel-aware timing and prints one table.  Class
and method names mirror the reference suite so results are comparable
line by line (reference benchmarks/benchmarks/{slope,...}.py).
"""

"""HISTORICAL (round 3): cost decomposition of the old f32 screen scan.

Question answered then: the warm screen time was per-WORK (n * sumE
pair evaluations), not per-step scan overhead, and C=512 sat at the
flat part of the chunk-size curve — so candidate volume (sumE), not
dispatch count, was the lever.  The experiment drove the round-4
redesign and the code it exercised is gone: the screen now expands
candidate tables ON DEVICE from 5 packed fields and evaluates a lean
pair kernel (viewshed_exact._expand_table / _screen_pairs), so the
old `_blocker_table_screen`/`_eval_buckets_screen_run` entry points no
longer exist.  See git history (round-3 tree) to reproduce the
original numbers; use tools/profile_exact_viewshed.py for phase-level
timing of the current path.
"""
print(__doc__)

"""L4 entry-point CLIs + the L5 recipe runner (SURVEY.md §1, §3.1).

Each module exposes `main(argv)` so the recipe runner (run.py) can invoke
stages in-process; `python -m shallow_wavenet_tpu.bin.<name>` works too.
"""

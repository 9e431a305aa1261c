"""Pallas TPU kernels for hot paths XLA cannot fuse itself.

Currently empty: both candidate kernels lost their hardware bake-offs
to XLA and were removed with measured verdicts — the masked-moments
kernel in r3 and the fused GoogLeNet trunk segments in r4 (SCALING.md
"Pallas verdict (r3)" / "Pallas verdict (r4)"). The package stays as
the home for future kernels that DO win on the chip.
"""

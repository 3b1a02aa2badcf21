"""Pure-Python extraction kernels (no Spark dependency).

These functions replicate the *semantics* of the reference PHP parsers
(file:line citations into /root/reference in each module) so that per-turn
extracted text/records match the reference bit-for-bit. They are written to
run row-wise inside Arrow-batched pandas UDF stages.
"""

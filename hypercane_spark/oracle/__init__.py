"""Pure-Python oracle transliterations of the reference's algorithms.

These are the *specification* side of every parity test: small, sequential,
list/dict-semantics implementations mirroring the cited functions in
/root/reference/hypercane (same random module usage, same ordering rules).
The pytest suite runs each Spark operator and asserts equality against the
oracle on the synthetic fixtures.
"""

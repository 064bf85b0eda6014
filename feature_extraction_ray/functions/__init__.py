"""Pure vectorized kernels (numpy / pyarrow.compute) used inside batch fns.

No Ray imports here — everything in this subpackage is testable without a
Ray session and is safe to call from any worker process.
"""

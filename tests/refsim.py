"""Re-export of the reference-semantics simulator.

The simulator itself lives in crawlspark/refsim.py (so the driver's
oracle generator can import it from the package namespace); it remains
the test-side oracle — it shares only pure content definitions with
the engine, never its dataflow.
"""

from crawlspark.refsim import RefSim, RefSimResult  # noqa: F401

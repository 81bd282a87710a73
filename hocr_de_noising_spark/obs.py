"""Bounded, non-blocking reads of df.observe metrics.

pyspark's ``Observation.get`` blocks forever if the CollectMetrics node
never reports (e.g. AQE pruned the branch). The JVM side offers
``getRowOrEmpty`` with a ~100 ms bounded wait — but observation metrics
are delivered via the ASYNC query-execution listener bus, so a single
bounded read can also race a late-but-real delivery under a loaded
driver. ``observation_metrics`` polls the bounded read for up to
``timeout_s`` seconds (the action has already finished when callers
invoke it, so real metrics land within milliseconds ordinarily) and
only then treats the node as never-reported.
"""

from __future__ import annotations

import time

from pyspark.sql import Observation


def observation_metrics(o: Observation, timeout_s: float = 10.0) -> dict | None:
    """Metrics dict of a finished action's Observation, or None if the
    node never reported (pruned branch / empty plan) within timeout_s.

    Never blocks indefinitely. A schema-less empty Row (how a pruned
    node surfaces) is treated the same as no row.

    The bounded JVM read needs the classic API's ``Observation._jo``;
    under Spark Connect ``Observation.__new__`` returns a
    ConnectObservation with no ``_jo`` (ADVICE r3), so that path falls
    back to ``Observation.get`` on a daemon thread with the same
    deadline — still never blocking the caller indefinitely. Known
    trade (r4 review): Python threads cannot be cancelled, so a
    never-reporting Connect observation leaves its daemon thread
    parked in ``o.get`` for the process lifetime — one small leaked
    thread per TIMED-OUT read, only on Connect, only when the node
    never reports (callers invoke this after the action finished, so
    the ordinary path returns within milliseconds). The pinned classic
    session never takes this branch.
    """
    from pyspark.serializers import CPickleSerializer

    if not hasattr(o, "_jo"):  # Spark Connect session
        import threading

        box: dict = {}

        def _get():
            # capture, don't swallow (ADVICE r4): a real error from the
            # Connect query (network failure, cancelled query) must
            # surface to the caller, not masquerade as a pruned-node None
            try:
                box["row"] = o.get
            except Exception as exc:  # noqa: BLE001 — re-raised on join
                box["exc"] = exc

        t = threading.Thread(target=_get, daemon=True)
        t.start()
        t.join(timeout_s)
        if "exc" in box:
            raise box["exc"]
        return dict(box["row"]) if "row" in box else None

    deadline = time.monotonic() + timeout_s
    while True:
        jopt = o._jo.getRowOrEmpty()  # JVM-side bounded ~100 ms wait
        if jopt.isDefined():
            if jopt.get().size() == 0:
                # definitive: the execution-end event arrived and this
                # node reported nothing (pruned / empty branch)
                return None
            utils = getattr(o._jvm, "org.apache.spark.sql.api.python.PythonSQLUtils")
            return CPickleSerializer().loads(utils.toPyRow(jopt.get())).asDict()
        # undefined = the async listener bus has not delivered yet —
        # the caller's action already finished, so keep polling briefly
        if time.monotonic() >= deadline:
            return None

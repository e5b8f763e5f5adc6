import faulthandler
import os

import pytest

os.environ.setdefault("RAY_DEDUP_LOGS", "1")

# Hang watchdog: a Ray local-mode streaming-executor deadlock was observed
# once in ~10 full-suite runs (driver blocked on a socket read, all workers
# IDLE, no errors in any Ray log).  No single test legitimately exceeds
# ~2 minutes; if one runs 10x that, dump every thread's stack and hard-exit
# so the hang surfaces as a diagnosable failure instead of a silent stall.
_TEST_TIMEOUT_S = 1200


@pytest.fixture(autouse=True)
def _hang_watchdog():
    faulthandler.dump_traceback_later(_TEST_TIMEOUT_S, exit=True)
    yield
    faulthandler.cancel_dump_traceback_later()


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_small():
    """sf0.001 fixtures root (deterministic, idempotent)."""
    from engine.fixtures import ensure_fixtures
    return ensure_fixtures("sf0.001")

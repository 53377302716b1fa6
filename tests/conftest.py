from __future__ import annotations

import random
import uuid

import pytest

from datalake_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


def random_metadata(rng: random.Random, **overrides) -> dict:
    """Random-but-valid metadata, modeled on the reference's generator
    (client/datalake/tests/conftest.py:60-100): start in 2010-2015, duration
    <= 3 days, random slugs, 50% null work_id."""
    start = rng.randint(1262304000000, 1420070400000)
    end = start + rng.randint(0, 3 * 86400000)
    m = {
        "version": 0,
        "start": start,
        "end": end if rng.random() > 0.2 else None,
        "what": rng.choice(["nginx", "syslog", "app"]),
        "where": rng.choice([f"host{i}" for i in range(10)]),
        "id": uuid.uuid4().hex,
        "hash": uuid.uuid4().hex,
        "path": "/var/log/syslog",
        "work_id": rng.choice([None, f"job{rng.randint(0, 5)}"]),
    }
    m.update(overrides)
    return m


@pytest.fixture(autouse=True)
def fsck_after_every_mutation(request):
    """Every catalog a test builds gets a deep fsck at teardown —
    individual features have their own tests, but the invariant sweep
    after each SEQUENCE catches cross-feature interactions for free
    (repo-wide since r6: streaming ingest, CLI, archive, and spool
    tests all mutate catalogs too).  Tests that deliberately corrupt
    state opt out with @pytest.mark.no_fsck."""
    from datalake_spark.catalog import Catalog

    made: list = []
    orig = Catalog.__init__

    def recording(self, *a, **k):
        orig(self, *a, **k)
        made.append(self)

    Catalog.__init__ = recording
    try:
        yield
    finally:
        Catalog.__init__ = orig
    if request.node.get_closest_marker("no_fsck") or not made:
        return
    seen: set = set()
    for cat in made:
        if cat.root in seen or not cat.store.exists_prefix(""):
            continue
        seen.add(cat.root)
        report = cat.fsck(deep=True)
        assert report["ok"], (
            f"post-test fsck violations in {cat.root}: {report['problems']}"
        )

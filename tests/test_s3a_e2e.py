"""Opt-in s3a end-to-end smoke — skipped by default, green when the
``hadoop-aws`` jar (S3AFileSystem) is on the classpath: the same
declared-gate pattern as the kafka-broker and ``av`` opt-ins.

Everything BELOW the s3a seam is always tested: the boto3 control plane
runs against moto in tests/test_s3store.py, and the catalog-over-S3
lifecycle runs there with a hybrid store standing in for the data plane.
This module closes the one untested deployment seam — Spark's OWN data
plane resolving ``s3a://`` through ``S3Store.spark_conf()`` — by
spinning a real moto HTTP server (the JVM cannot see mock_aws's botocore
patching) and driving one catalog append + query through it.

Run it for real with:

    spark-submit --packages org.apache.hadoop:hadoop-aws:<hadoop-ver> \\
        python -m pytest tests/test_s3a_e2e.py

Reference analog: the reference's API suite runs its archive against a
mocked S3 endpoint end to end (api/tests/conftest.py:99-143); this is
the same strategy with Spark as the reader/writer.
"""

import uuid

import pytest


def _s3a_gate(spark) -> str | None:
    """None when the e2e can run; otherwise the skip reason."""
    try:
        # classloader probe for the S3A filesystem — the same loader
        # Hadoop resolves fs.s3a.impl through
        spark._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
    except Exception:
        return "hadoop-aws (S3AFileSystem) not on the classpath"
    try:
        from moto.server import ThreadedMotoServer  # noqa: F401
    except Exception:
        return "moto.server unavailable"
    return None


@pytest.mark.no_fsck  # fsck runs inside the test, while the server lives
class TestS3aEndToEnd:
    def test_catalog_append_and_query_through_s3a(self, spark):
        reason = _s3a_gate(spark)
        if reason:
            pytest.skip(reason)
        import boto3
        from moto.server import ThreadedMotoServer

        from datalake_spark.catalog import Catalog
        from datalake_spark.s3store import S3Store
        from tests.test_catalog_commits import T0, make_files_df

        server = ThreadedMotoServer(port=0)
        server.start()
        try:
            host, port = server.get_host_and_port()
            endpoint = f"http://{host}:{port}"
            client = boto3.client(
                "s3", endpoint_url=endpoint, region_name="us-east-1",
                aws_access_key_id="testing",
                aws_secret_access_key="testing",
            )
            bucket = f"s3a-{uuid.uuid4().hex[:10]}"
            client.create_bucket(Bucket=bucket)
            store = S3Store(bucket, "lake/cat", client=client)
            hconf = spark._jsc.hadoopConfiguration()
            # magic_committer=False: the committer bindings need the
            # spark-hadoop-cloud jar besides hadoop-aws; the smoke pins
            # the s3a READ/WRITE seam, not the committer choice
            conf = store.spark_conf(
                endpoint=endpoint, magic_committer=False
            )
            conf.update({
                "fs.s3a.access.key": "testing",
                "fs.s3a.secret.key": "testing",
                "fs.s3a.connection.ssl.enabled": "false",
                # fail fast instead of the default multi-minute retries
                # if the moto endpoint vanishes mid-test
                "fs.s3a.attempts.maximum": "3",
            })
            for k, v in conf.items():
                hconf.set(k, v)

            cat = Catalog(spark, store.url, store=store)
            rows = [
                {"id": f"f{i}", "what": "nginx", "where": f"h{i % 2}",
                 "start": T0 + i, "end": None, "work_id": f"job{i}"}
                for i in range(4)
            ]
            cat.append(make_files_df(spark, rows))
            # the read path resolves s3a:// URLs from the SAME bucket
            # the boto3 control plane committed
            got = {r["id"] for r in cat.files().collect()}
            assert got == {f"f{i}" for i in range(4)}
            cat.refresh_latest()
            latest = {
                (r["what"], r["where"]): r["id"]
                for r in cat.latest_table().collect()
            }
            assert latest[("nginx", "h0")] == "f2"
            assert latest[("nginx", "h1")] == "f3"
            assert cat.fsck(deep=True)["ok"]
        finally:
            server.stop()

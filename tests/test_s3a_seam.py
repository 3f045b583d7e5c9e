"""S3A endpoint seam: env-driven conf wiring (the object-store counterpart
of the JDBC_URL seam — tests/test_cli.py::test_jdbc_target_from_env)."""

from __future__ import annotations

from etl_from_s3_to_postgresql_template_spark.session import s3a_conf


def test_no_endpoint_means_no_overrides():
    assert s3a_conf({}) == {}
    # credentials alone must NOT inject anything: without an endpoint the
    # AWS default chain (instance profile, region endpoints) stays in charge
    assert s3a_conf({"AWS_ACCESS_KEY_ID": "k", "AWS_SECRET_ACCESS_KEY": "s"}) == {}


def test_minio_style_endpoint_wiring():
    conf = s3a_conf(
        {
            "S3_ENDPOINT_URL": "http://localhost:9000",
            "AWS_ACCESS_KEY_ID": "minio",
            "AWS_SECRET_ACCESS_KEY": "minio123",
        }
    )
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://localhost:9000"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "minio"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "minio123"


def test_https_endpoint_keeps_ssl_and_path_style_overridable():
    conf = s3a_conf(
        {"S3_ENDPOINT_URL": "https://s3.example.com", "S3_PATH_STYLE_ACCESS": "false"}
    )
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "true"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "false"
    # no credentials in env -> none injected (IAM-role deployments)
    assert "spark.hadoop.fs.s3a.access.key" not in conf

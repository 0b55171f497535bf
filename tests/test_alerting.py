"""Alerting tests — same shapes as the reference's mock-patch suite
(ref tests/unit/test_alerting.py:27-145), with the transport seam
(post_json) patched instead of requests.post."""

from __future__ import annotations

from unittest.mock import MagicMock, patch

from fintech_lakehouse_spark.alerting import (
    PAGERDUTY_EVENTS_URL,
    Alert,
    AlertManager,
    Severity,
    send_dq_failure_alert,
    send_pipeline_failure_alert,
)


def test_dry_run_does_not_send():
    with patch("fintech_lakehouse_spark.alerting.post_json") as mock_post:
        manager = AlertManager(slack_webhook="https://fake.slack/hook", dry_run=True)
        assert manager.send_alert(
            title="Test", message="m", severity=Severity.P3, pipeline="p"
        )
        mock_post.assert_not_called()


def test_severity_colors_and_emojis_defined():
    for severity in Severity:
        assert severity in AlertManager.SEVERITY_COLORS
        assert severity in AlertManager.SEVERITY_EMOJI


@patch("fintech_lakehouse_spark.alerting.post_json")
def test_slack_called_for_all_severities(mock_post: MagicMock):
    mock_post.return_value = 200
    manager = AlertManager(slack_webhook="https://fake.slack/hook")
    for severity in Severity:
        assert manager.send_alert(
            title="T", message="m", severity=severity, pipeline="p"
        )
    assert mock_post.call_count == len(Severity)


@patch("fintech_lakehouse_spark.alerting.post_json")
def test_pagerduty_only_called_for_p1(mock_post: MagicMock):
    mock_post.side_effect = lambda url, payload, timeout=10.0: (
        202 if url == PAGERDUTY_EVENTS_URL else 200
    )
    manager = AlertManager(
        slack_webhook="https://fake.slack/hook", pagerduty_key="key"
    )
    manager.send_alert(title="T", message="m", severity=Severity.P2, pipeline="p")
    assert mock_post.call_count == 1
    assert "slack" in mock_post.call_args[0][0]

    mock_post.reset_mock()
    assert manager.send_alert(
        title="T", message="m", severity=Severity.P1, pipeline="p"
    )
    assert mock_post.call_count == 2
    urls = {c.args[0] for c in mock_post.call_args_list}
    assert PAGERDUTY_EVENTS_URL in urls


@patch("fintech_lakehouse_spark.alerting.post_json")
def test_channel_failure_returns_false_not_raise(mock_post: MagicMock):
    mock_post.side_effect = OSError("network down")
    manager = AlertManager(slack_webhook="https://fake.slack/hook")
    assert (
        manager.send_alert(title="T", message="m", severity=Severity.P2, pipeline="p")
        is False
    )


def test_alert_to_dict():
    alert = Alert(title="T", message="m", severity=Severity.P4, pipeline="p")
    d = alert.to_dict()
    assert d["severity"] == "P4_LOW" and d["title"] == "T"
    assert "timestamp" in d


@patch("fintech_lakehouse_spark.alerting.post_json")
def test_convenience_senders(mock_post: MagicMock):
    mock_post.return_value = 200
    manager = AlertManager(slack_webhook="https://fake.slack/hook")
    assert send_pipeline_failure_alert(manager, "silver_txns", "boom", retry_count=3)
    payload = mock_post.call_args[0][1]
    blocks = payload["attachments"][0]["blocks"]
    assert "P1_CRITICAL" in blocks[0]["text"]["text"]

    mock_post.reset_mock()
    assert send_dq_failure_alert(
        manager, "silver_txns", "transactions", "uniqueness_id", 5, 1000
    )
    payload = mock_post.call_args[0][1]
    assert payload["attachments"][0]["color"] == AlertManager.SEVERITY_COLORS[Severity.P2]


def test_compat_exposes_reference_names():
    """Every public name from the reference's src/ modules resolves in
    compat — the 'switch your imports and run' contract."""
    from fintech_lakehouse_spark import compat

    reference_public_api = [
        # spark_utils.py
        "get_spark", "read_csv_to_df", "read_json_to_df", "read_delta_table",
        "write_delta_table", "register_delta_table", "upsert_delta_table",
        "add_ingestion_metadata", "add_processing_metadata",
        "add_surrogate_key", "deduplicate_by_key",
        "standardize_string_columns", "optimize_delta_table",
        "vacuum_delta_table", "table_exists", "delta_table_exists",
        "get_table_row_count",
        # data_quality.py
        "DataQualityChecker", "DQCheckResult", "DQCheckType", "DQReport",
        "DQSeverity", "quick_quality_check",
        # monitoring.py
        "PipelineMonitor", "PipelineStatus", "StageMetrics",
        "check_data_freshness", "check_volume_anomaly",
        "create_metrics_table",
        # alerting.py
        "AlertManager", "Severity", "Alert", "send_pipeline_failure_alert",
        "send_dq_failure_alert", "send_freshness_alert",
        # config/
        "BaseConfig", "DevConfig", "ProdConfig", "BusinessRules",
        "DataQualityThresholds", "get_config", "get_config_for_env",
        # data_generator/
        "DataGenerator", "GeneratorConfig",
    ]
    missing = [n for n in reference_public_api if not hasattr(compat, n)]
    assert not missing, f"compat missing reference names: {missing}"


def test_config_compat_semantics():
    from fintech_lakehouse_spark import compat

    dev = compat.get_config_for_env("dev")
    prod = compat.get_config_for_env("prod")
    assert dev.ENVIRONMENT == "dev" and not dev.DQ_FAIL_ON_CRITICAL
    assert prod.ENVIRONMENT == "prod" and prod.DQ_FAIL_ON_CRITICAL
    assert dev.get_database("gold") == "fintech_gold_dev"
    assert prod.get_database("gold") == "fintech_gold"
    assert dev.get_table_path("silver", "transactions").endswith(
        "silver/transactions"
    )
    assert dev.business_rules.STRUCTURING_THRESHOLD == 9_000.00
    assert dev.dq_thresholds.COMPLETENESS_THRESHOLD == 0.95

"""Severity-routed pipeline alerting (ref: src/utils/alerting.py).

Routing contract (ref :198-206): every alert prints to the console;
Slack receives all severities when a webhook is configured; PagerDuty
is paged ONLY for P1 (ref :203-205 — "wakes up on-call"). ``dry_run``
short-circuits before any network call (ref :199-201).

Transport is stdlib ``urllib`` behind :func:`post_json` so the engine
adds no HTTP dependency; tests patch ``post_json`` the way the
reference's tests patch ``requests.post``
(ref tests/unit/test_alerting.py:56-114).
"""

from __future__ import annotations

import json
import urllib.request
from dataclasses import dataclass, field
from datetime import datetime
from enum import Enum
from typing import Any

PAGERDUTY_EVENTS_URL = "https://events.pagerduty.com/v2/enqueue"


class Severity(Enum):
    """P1 pages on-call, P2 needs attention today, P3 this week, P4
    informational (ref: src/utils/alerting.py:46-60)."""

    P1 = "P1_CRITICAL"
    P2 = "P2_HIGH"
    P3 = "P3_MEDIUM"
    P4 = "P4_LOW"


@dataclass
class Alert:
    """One alert event (ref: src/utils/alerting.py:63-96)."""

    title: str
    message: str
    severity: Severity
    pipeline: str
    timestamp: datetime = field(default_factory=datetime.now)
    runbook_url: str | None = None
    additional_context: dict[str, Any] | None = None

    def to_dict(self) -> dict[str, Any]:
        return {
            "title": self.title,
            "message": self.message,
            "severity": self.severity.value,
            "pipeline": self.pipeline,
            "timestamp": self.timestamp.isoformat(),
            "runbook_url": self.runbook_url,
            "additional_context": self.additional_context,
        }


def post_json(url: str, payload: dict[str, Any], timeout: float = 10.0) -> int:
    """POST a JSON body, return the HTTP status code. The single
    network seam — patch this in tests."""
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        return resp.status


class AlertManager:
    """Sends alerts to console + Slack (+ PagerDuty for P1).

    ref: src/utils/alerting.py:99-344. Failure handling matches the
    reference: a channel error logs and returns False, it never
    raises into the pipeline.
    """

    SEVERITY_COLORS = {
        Severity.P1: "#FF0000",
        Severity.P2: "#FFA500",
        Severity.P3: "#FFFF00",
        Severity.P4: "#00FF00",
    }
    SEVERITY_EMOJI = {
        Severity.P1: "🚨",
        Severity.P2: "⚠️",
        Severity.P3: "📢",
        Severity.P4: "ℹ️",
    }

    def __init__(
        self,
        slack_webhook: str | None = None,
        pagerduty_key: str | None = None,
        dry_run: bool = False,
    ) -> None:
        self.slack_webhook = slack_webhook
        self.pagerduty_key = pagerduty_key
        self.dry_run = dry_run

    def send_alert(
        self,
        title: str,
        message: str,
        severity: Severity,
        pipeline: str,
        runbook_url: str | None = None,
        additional_context: dict[str, Any] | None = None,
    ) -> bool:
        alert = Alert(
            title=title,
            message=message,
            severity=severity,
            pipeline=pipeline,
            runbook_url=runbook_url,
            additional_context=additional_context,
        )
        self._print_alert(alert)
        if self.dry_run:
            print("[DRY RUN] alert not sent")
            return True
        ok = True
        if self.slack_webhook:
            ok = self._send_slack(alert) and ok
        if severity == Severity.P1 and self.pagerduty_key:
            ok = self._send_pagerduty(alert) and ok
        return ok

    def _print_alert(self, alert: Alert) -> None:
        emoji = self.SEVERITY_EMOJI[alert.severity]
        lines = [
            f"{emoji} [{alert.severity.value}] {alert.title}",
            f"  pipeline={alert.pipeline} time={alert.timestamp.isoformat()}",
            f"  {alert.message}",
        ]
        if alert.runbook_url:
            lines.append(f"  runbook: {alert.runbook_url}")
        print("\n".join(lines))

    def _send_slack(self, alert: Alert) -> bool:
        """Block Kit payload (ref :220-296): header + message + field
        grid, runbook link and context bullets when present, severity
        color on the attachment."""
        blocks: list[dict[str, Any]] = [
            {
                "type": "header",
                "text": {
                    "type": "plain_text",
                    "text": (
                        f"{self.SEVERITY_EMOJI[alert.severity]} "
                        f"[{alert.severity.value}] {alert.title}"
                    ),
                },
            },
            {"type": "section", "text": {"type": "mrkdwn", "text": alert.message}},
            {
                "type": "section",
                "fields": [
                    {"type": "mrkdwn", "text": f"*Pipeline:*\n{alert.pipeline}"},
                    {
                        "type": "mrkdwn",
                        "text": (
                            "*Time:*\n"
                            + alert.timestamp.strftime("%Y-%m-%d %H:%M:%S")
                        ),
                    },
                ],
            },
        ]
        if alert.runbook_url:
            blocks.append(
                {
                    "type": "section",
                    "text": {
                        "type": "mrkdwn",
                        "text": f"<{alert.runbook_url}|View Runbook>",
                    },
                }
            )
        if alert.additional_context:
            bullets = "\n".join(
                f"• *{k}:* {v}" for k, v in alert.additional_context.items()
            )
            blocks.append(
                {
                    "type": "section",
                    "text": {"type": "mrkdwn", "text": f"*Context:*\n{bullets}"},
                }
            )
        payload = {
            "attachments": [
                {"color": self.SEVERITY_COLORS[alert.severity], "blocks": blocks}
            ]
        }
        try:
            return post_json(self.slack_webhook, payload) == 200
        except Exception as exc:  # noqa: BLE001 - alerting must not raise
            print(f"slack alert failed: {exc}")
            return False

    def _send_pagerduty(self, alert: Alert) -> bool:
        """Events API v2 trigger (ref :300-344). The dedup key folds
        pipeline + title + day so a flapping pipeline pages once per
        day, not once per retry."""
        day = alert.timestamp.strftime("%Y%m%d")
        payload: dict[str, Any] = {
            "routing_key": self.pagerduty_key,
            "event_action": "trigger",
            "dedup_key": f"{alert.pipeline}_{alert.title}_{day}",
            "payload": {
                "summary": f"[{alert.severity.value}] {alert.title}",
                "source": alert.pipeline,
                "severity": "critical",
                "timestamp": alert.timestamp.isoformat(),
                "custom_details": {
                    "message": alert.message,
                    "runbook": alert.runbook_url,
                    "additional_context": alert.additional_context,
                },
            },
            "links": (
                [{"href": alert.runbook_url, "text": "Runbook"}]
                if alert.runbook_url
                else []
            ),
        }
        try:
            return post_json(PAGERDUTY_EVENTS_URL, payload) == 202
        except Exception as exc:  # noqa: BLE001
            print(f"pagerduty alert failed: {exc}")
            return False


def send_pipeline_failure_alert(
    alert_manager: AlertManager,
    pipeline_name: str,
    error_message: str,
    retry_count: int = 0,
    runbook_url: str | None = None,
) -> bool:
    """P1 pipeline-failure alert (ref: src/utils/alerting.py:355-386)."""
    return alert_manager.send_alert(
        title=f"{pipeline_name} Pipeline Failed",
        message=(
            f"Pipeline failed after {retry_count} retries.\n\n"
            f"*Error:*\n```{error_message[:500]}```"
        ),
        severity=Severity.P1,
        pipeline=pipeline_name,
        runbook_url=runbook_url,
        additional_context={"Retry Count": retry_count},
    )


def send_dq_failure_alert(
    alert_manager: AlertManager,
    pipeline_name: str,
    table_name: str,
    check_name: str,
    failed_records: int,
    total_records: int,
    severity: Severity = Severity.P2,
    runbook_url: str | None = None,
) -> bool:
    """DQ-failure alert (ref: src/utils/alerting.py:389-431)."""
    fail_rate = failed_records / total_records * 100 if total_records else 0.0
    return alert_manager.send_alert(
        title=f"Data Quality Check Failed: {check_name}",
        message=(
            f"DQ check `{check_name}` failed on table `{table_name}`.\n\n"
            f"*Failed Records:* {failed_records:,} ({fail_rate:.2f}%)\n"
            f"*Total Records:* {total_records:,}"
        ),
        severity=severity,
        pipeline=pipeline_name,
        runbook_url=runbook_url,
        additional_context={
            "Table": table_name,
            "Check": check_name,
            "Fail Rate": f"{fail_rate:.2f}%",
        },
    )


def send_freshness_alert(
    alert_manager: AlertManager,
    table_name: str,
    hours_old: float,
    sla_hours: int,
    runbook_url: str | None = None,
) -> bool:
    """Freshness-SLA-breach alert (ref: src/utils/alerting.py:434-464)."""
    return alert_manager.send_alert(
        title=f"Data Freshness SLA Breach: {table_name}",
        message=(
            f"Table `{table_name}` data is {hours_old:.1f} hours old.\n"
            f"SLA: {sla_hours} hours.\n\nCheck upstream pipelines."
        ),
        severity=Severity.P2,
        pipeline=f"freshness_check_{table_name}",
        runbook_url=runbook_url,
        additional_context={
            "Table": table_name,
            "Current Age": f"{hours_old:.1f} hours",
            "SLA": f"{sla_hours} hours",
        },
    )

"""S12: run notification with report attachment (reference
helpers:637-654 — Airflow ``send_email`` with the validation HTML
attached).

Notification is a scheduler/driver concern, not an engine operator; the
engine ships a pluggable transport so the job can emit its audit +
validation artifacts wherever the deployment wants:

  * ``FileOutboxTransport`` — always available: writes one JSON
    "message" per notification into an outbox directory (the pattern a
    workflow engine or mail relay tails). Default, used by tests.
  * ``SmtpTransport`` — stdlib smtplib against a configured relay; built
    lazily so environments without an SMTP endpoint never touch it.
"""

from __future__ import annotations

import datetime as dt
import json
import os


class FileOutboxTransport:
    def __init__(self, outbox_dir: str):
        self.outbox_dir = outbox_dir

    def send(self, message: dict) -> str:
        os.makedirs(self.outbox_dir, exist_ok=True)
        # deterministic, collision-free name: subject slug + sequence
        seq = len(os.listdir(self.outbox_dir))
        slug = "".join(ch if ch.isalnum() else "_" for ch in message["subject"])[:40]
        path = os.path.join(self.outbox_dir, f"{seq:06d}_{slug}.json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(message, f, ensure_ascii=False, indent=2)
        return path


class SmtpTransport:
    def __init__(self, host: str, port: int = 25, sender: str = "etl@localhost"):
        self.host, self.port, self.sender = host, port, sender

    def send(self, message: dict) -> str:  # pragma: no cover - needs a relay
        import smtplib
        from email.message import EmailMessage

        em = EmailMessage()
        em["From"] = self.sender
        em["To"] = ", ".join(message["to"])
        em["Subject"] = message["subject"]
        em.set_content(message["html"], subtype="html")
        for name, payload in message.get("attachments", {}).items():
            em.add_attachment(
                payload.encode(), maintype="text", subtype="html", filename=name
            )
        with smtplib.SMTP(self.host, self.port) as s:
            s.send_message(em)
        return f"smtp://{self.host}:{self.port}"


def send_run_report(
    transport,
    to: list[str],
    subject: str,
    html_body: str,
    attachment_paths: list[str] | None = None,
    logical_date: dt.datetime | None = None,
) -> str:
    """Reference parity: subject/body/attached files (helpers:645-653).
    Attachments are read driver-side (they are the tiny HTML/JSON report
    artifacts, not data)."""
    attachments = {}
    for p in attachment_paths or []:
        with open(p, encoding="utf-8") as f:
            attachments[os.path.basename(p)] = f.read()
    return transport.send({
        "to": to,
        "subject": subject,
        "html": html_body,
        "attachments": attachments,
        "logical_date": logical_date.isoformat() if logical_date else None,
    })

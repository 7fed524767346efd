"""T5 alert delivery: the SMTP implementation of the AlertHook seam
(reference `extract_file.py:365-394`), exercised over a mock transport
— no network, no live SMTP server."""

from __future__ import annotations

import pytest

from nlu_data_warehouse_project_spark.pipeline import Warehouse
from nlu_data_warehouse_project_spark.pipeline.alerts import smtp_alert


class FakeSMTP:
    """Records the reference's exact call sequence (starttls → login →
    send) instead of opening a socket."""

    instances: list["FakeSMTP"] = []

    def __init__(self, host, port):
        self.host, self.port = host, port
        self.calls: list[tuple] = []
        self.sent: list = []
        FakeSMTP.instances.append(self)

    def __enter__(self):
        self.calls.append(("connect",))
        return self

    def __exit__(self, *exc):
        self.calls.append(("quit",))
        return False

    def starttls(self):
        self.calls.append(("starttls",))

    def login(self, user, pw):
        self.calls.append(("login", user, pw))

    def send_message(self, msg):
        self.calls.append(("send",))
        self.sent.append(msg)


class ExplodingSMTP(FakeSMTP):
    def send_message(self, msg):
        raise ConnectionResetError("relay down")


@pytest.fixture(autouse=True)
def _reset_fake():
    FakeSMTP.instances = []
    yield


def test_smtp_alert_sends_reference_shaped_mail():
    hook = smtp_alert(
        "smtp.example.com", 587, "warehouse@example.com", "oncall@example.com",
        username="warehouse@example.com", password="app-pw", transport=FakeSMTP,
    )
    hook("staging load failed for id_config=1 day=2024-12-08", ValueError("bad feed"))

    (smtp,) = FakeSMTP.instances
    assert smtp.host == "smtp.example.com" and smtp.port == 587
    # the reference's sequence: starttls before login before send
    names = [c[0] for c in smtp.calls]
    assert names == ["connect", "starttls", "login", "send", "quit"]
    assert ("login", "warehouse@example.com", "app-pw") in smtp.calls

    (msg,) = smtp.sent
    assert msg["From"] == "warehouse@example.com"
    assert msg["To"] == "oncall@example.com"
    assert "ValueError" in msg["Subject"] and "bad feed" in msg["Subject"]
    assert "id_config=1" in msg.get_content()


def test_smtp_alert_multiple_recipients_and_no_auth():
    hook = smtp_alert(
        "relay.internal", 25, "wh@x", ["a@x", "b@x"],
        use_starttls=False, transport=FakeSMTP,
    )
    hook("m", RuntimeError("r"))
    (smtp,) = FakeSMTP.instances
    names = [c[0] for c in smtp.calls]
    assert "starttls" not in names and "login" not in names
    assert smtp.sent[0]["To"] == "a@x, b@x"


def test_smtp_alert_rejects_empty_recipients():
    with pytest.raises(ValueError):
        smtp_alert("h", 25, "s@x", [])


def test_multiline_exception_message_still_delivers():
    """Spark/Py4J exceptions are multi-line; header values must not be.
    The hook must sanitize — NOT raise (which would mask the pipeline
    failure) and NOT silently fail delivery."""
    hook = smtp_alert("h", 25, "s@x", "t@x", use_starttls=False, transport=FakeSMTP)
    hook("m", RuntimeError("line one\nline two\r\nline three"))
    sent = [m for s in FakeSMTP.instances for m in s.sent]
    assert len(sent) == 1
    assert "line one line two line three" in sent[0]["Subject"]
    assert "\n" not in sent[0]["Subject"]


def test_send_failure_is_contained_and_reported():
    seen = []
    hook = smtp_alert(
        "h", 25, "s@x", "t@x", use_starttls=False,
        transport=ExplodingSMTP, on_send_error=seen.append,
    )
    # must NOT raise: the pipeline exception in flight stays primary
    hook("m", RuntimeError("pipeline failure"))
    assert len(seen) == 1 and isinstance(seen[0], ConnectionResetError)


def test_pipeline_failure_path_delivers_smtp_mail(spark, tmp_path):
    """End-to-end through the Warehouse seam: a staging failure lands as
    one mock-delivered email, subject carrying the exception type."""
    hook = smtp_alert(
        "smtp.example.com", 587, "wh@x", "oncall@x",
        use_starttls=False, transport=FakeSMTP,
    )
    wh = Warehouse(spark, str(tmp_path / "wh"), alert=hook)
    bad = spark.createDataFrame([("x",)], ["not_a_feed_col"])
    wh.extract(bad, 1, "2024-12-08")
    with pytest.raises(Exception):
        wh.load_to_staging(1, "2024-12-08")
    sent = [m for s in FakeSMTP.instances for m in s.sent]
    assert len(sent) == 1
    assert "staging load failed" in sent[0].get_content()

"""Alert delivery for the ``Warehouse`` failure paths (T5).

The reference emails every failure over Gmail SMTP with STARTTLS
(`extract_file.py:365-394`: build a MIME message, ``starttls`` →
``login`` → ``sendmail``, and swallow delivery errors so an alert
failure never masks the pipeline failure it reports).  The engine keeps
alerting behind the ``AlertHook`` seam — ``Warehouse(alert=...)`` —
because delivery is deployment policy, not query semantics; this module
supplies the SMTP implementation of that seam so a user porting the
reference gets the same behavior out of the box.

``smtp_alert`` is a factory, not a sender: it closes over the server
coordinates once and returns the ``(message, exc) -> None`` callable
the pipeline expects.  The SMTP client itself is injected
(``transport`` defaults to ``smtplib.SMTP``) so tests — and deployments
with a relay wrapper — swap it without monkeypatching the stdlib.
"""

from __future__ import annotations

import smtplib
import sys
from collections.abc import Callable
from email.message import EmailMessage


def smtp_alert(
    host: str,
    port: int,
    sender: str,
    to: str | list[str],
    *,
    username: str | None = None,
    password: str | None = None,
    use_starttls: bool = True,
    subject_prefix: str = "[warehouse alert]",
    transport: Callable[..., smtplib.SMTP] = smtplib.SMTP,
    on_send_error: Callable[[Exception], None] | None = None,
) -> Callable[[str, Exception], None]:
    """Build an ``AlertHook`` that emails each failure message.

    Mirrors the reference's ``send_email`` flow (STARTTLS → optional
    login → send) with the hard-coded Gmail account generalized to
    parameters.  Like the reference, a delivery error is contained: the
    hook reports it via ``on_send_error`` (default: one line on stderr)
    and returns, so the original pipeline exception — already in
    flight when the hook runs — stays the one the caller sees.

    The subject carries the exception type; the body carries the full
    pipeline message (which includes the traceback on the extract
    path).  ``to`` may be one address or a list.
    """
    recipients = [to] if isinstance(to, str) else list(to)
    if not recipients:
        raise ValueError("smtp_alert needs at least one recipient")

    def _report(exc: Exception) -> None:
        if on_send_error is not None:
            on_send_error(exc)
        else:
            print(f"smtp_alert: delivery failed: {exc!r}", file=sys.stderr)

    def hook(message: str, exc: Exception) -> None:
        try:
            # header values must be newline-free (EmailMessage raises on
            # CR/LF) and Spark/Py4J exception strings are almost always
            # multi-line — sanitize BEFORE header set, and keep even the
            # message construction inside the containment: a hook that
            # raises would mask the pipeline failure already in flight
            exc_line = " ".join(f"{type(exc).__name__}: {exc}".split())
            msg = EmailMessage()
            msg["From"] = sender
            msg["To"] = ", ".join(recipients)
            msg["Subject"] = f"{subject_prefix} {exc_line}"[:200]
            msg.set_content(message)
            with transport(host, port) as server:
                if use_starttls:
                    server.starttls()
                if username is not None:
                    server.login(username, password or "")
                server.send_message(msg)
        except Exception as send_exc:  # never mask the pipeline failure
            _report(send_exc)

    return hook

"""Syslog parser cases mirroring the reference's canonical table tests
(pkg/stanza/operator/parser/syslog/syslogtest/data.go and
parser_test.go)."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.stages.syslog import SyslogParser


def _parse(lines, **kw):
    ds = ray.data.from_arrow(pa.table({"text": lines}))
    return SyslogParser(parse_from="text", **kw).apply(ds).to_pandas()


def test_rfc5424_full():
    # syslogtest/data.go "RFC5424"
    line = ('<86>1 2015-08-05T21:58:59.693Z 192.168.2.132 SecureAuth0 23108 ID52020 '
            '[SecureAuth@27389 UserHostAddress="192.168.2.132" Realm="SecureAuth0" '
            'UserID="Tester2" PEN="27389"] '
            "Found the user for retrieving user's profile")
    r = _parse([line], protocol="rfc5424").iloc[0]
    assert r["priority"] == 86
    assert r["facility"] == 10 and r["facility_text"] == "authpriv"
    assert r["severity"] == 6 and r["severity_text"] == "info"
    assert r["severity_number"] == 9  # entry.Info
    assert r["version"] == 1
    assert r["hostname"] == "192.168.2.132"
    assert r["appname"] == "SecureAuth0"
    assert r["proc_id"] == "23108" and r["msg_id"] == "ID52020"
    assert r["message"] == "Found the user for retrieving user's profile"
    assert r["timestamp"] == pd.Timestamp("2015-08-05T21:58:59.693Z")
    import json

    sd = json.loads(r["structured_data"])
    assert sd == {"SecureAuth@27389": {
        "UserHostAddress": "192.168.2.132", "Realm": "SecureAuth0",
        "UserID": "Tester2", "PEN": "27389"}}


def test_rfc5424_nil_fields_and_offset_ts():
    # parser_test.go entry2: nil msgid/sd, -07:00 offset, micros
    line = "<165>1 2003-08-24T05:14:15.000003-07:00 192.0.2.1 myproc 8710 - - %% It's time to make the do-nuts."
    r = _parse([line], protocol="rfc5424").iloc[0]
    assert r["priority"] == 165
    assert r["facility"] == 20 and r["facility_text"] == "local4"
    assert r["severity_text"] == "notice"
    assert pd.isna(r["msg_id"]) and pd.isna(r["structured_data"])
    assert r["message"] == "%% It's time to make the do-nuts."
    assert r["timestamp"] == pd.Timestamp("2003-08-24T12:14:15.000003Z")


def test_rfc5424_skip_pri():
    # syslogtest/data.go RFC5424SkipPriAbsent / Present
    absent = ('1 2015-08-05T21:58:59.693Z 192.168.2.132 SecureAuth0 23108 ID52020 '
              '[SecureAuth@27389 UserID="Tester2"] msg')
    present = "<123>" + absent
    out = _parse([absent, present], protocol="rfc5424", allow_skip_pri_header=True)
    a, p = out.iloc[0], out.iloc[1]
    assert pd.isna(a["priority"]) and pd.isna(a["severity_text"]) and pd.isna(a["facility"])
    assert a["hostname"] == "192.168.2.132" and a["appname"] == "SecureAuth0"
    assert p["priority"] == 123 and p["severity_text"] == "err"
    # without allow_skip, the pri-less row is a parse error
    strict = _parse([absent], protocol="rfc5424", on_error="drop")
    assert len(strict) == 0


def test_rfc3164_basic_and_detroit():
    # syslogtest/data.go "RFC3164": <34>Jan  2 15:04:05 1.2.3.4 apache_server: test message
    line = "<34>Jan  2 15:04:05 1.2.3.4 apache_server: test message"
    r = _parse([line], protocol="rfc3164", rfc3164_year=2026).iloc[0]
    assert r["priority"] == 34
    assert r["facility"] == 4 and r["facility_text"] == "auth"
    assert r["severity_text"] == "crit" and r["severity_number"] == 18  # entry.Error2
    assert r["hostname"] == "1.2.3.4" and r["appname"] == "apache_server"
    assert r["message"] == "test message"
    assert r["timestamp"] == pd.Timestamp("2026-01-02T15:04:05Z")

    d = _parse([line], protocol="rfc3164", location="America/Detroit",
               rfc3164_year=2026).iloc[0]
    assert d["timestamp"] == pd.Timestamp("2026-01-02T20:04:05Z")  # EST = UTC-5


def test_rfc3164_procid_and_skip_pri():
    out = _parse(
        ["<123>Oct 11 22:14:15 host su[1234]: auth failure",
         "Oct 11 22:14:15 1.2.3.4 apache_server: test message"],
        protocol="rfc3164", allow_skip_pri_header=True, rfc3164_year=2026,
    )
    a, b = out.iloc[0], out.iloc[1]
    assert a["proc_id"] == "1234" and a["appname"] == "su"
    assert a["facility"] == 15 and a["facility_text"] == "cron2"  # data.go RFC3164SkipPriPresent
    assert pd.isna(b["priority"]) and b["appname"] == "apache_server"


def test_none_protocol_raw_and_pri():
    # syslogtest/data.go NoneProtocol* family
    out = _parse(
        ["my custom syslog message without any timestamp",
         "<34>my raw message with a pri header",
         "<999>this is not a valid pri header",
         "prefix <34> rest of message"],
        protocol="none",
    )
    r0, r1, r2, r3 = (out.iloc[i] for i in range(4))
    assert r0["message"] == "my custom syslog message without any timestamp"
    assert pd.isna(r0["priority"])
    assert r1["priority"] == 34 and r1["severity_text"] == "crit" and r1["facility_text"] == "auth"
    assert r1["message"] == "<34>my raw message with a pri header"  # PRI left in place
    assert pd.isna(r2["priority"])  # out-of-range PRI not decoded
    assert pd.isna(r3["priority"])  # PRI not at start not decoded


def test_octet_counting_and_trailer():
    # NoneProtocolOctetCounting: "46 my custom..." -> prefix stripped
    out = _parse(["46 my custom syslog message without any timestamp",
                  "46<13>raw message left intact"],
                 protocol="none", enable_octet_counting=True)
    assert out.iloc[0]["message"] == "my custom syslog message without any timestamp"
    assert out.iloc[1]["message"] == "46<13>raw message left intact"  # no space -> intact

    # non-transparent framing NUL trailer on rfc5424
    line = ('<86>1 2015-08-05T21:58:59.693Z 192.168.2.132 SecureAuth0 23108 ID52020 '
            '[SecureAuth@27389 UserID="Tester2"] Found the user\x00')
    r = _parse([line], protocol="rfc5424",
               non_transparent_framing_trailer="NUL").iloc[0]
    assert r["message"] == "Found the user"


def test_on_error_send_vs_drop():
    lines = ["<34>1 2003-10-11T22:14:15.003Z host app - ID47 - body",
             "definitely not syslog"]
    sent = _parse(lines, protocol="rfc5424", on_error="send")
    assert len(sent) == 2 and pd.isna(sent.iloc[1]["priority"]) and pd.isna(sent.iloc[1]["message"])
    dropped = _parse(lines, protocol="rfc5424", on_error="drop")
    assert len(dropped) == 1 and dropped.iloc[0]["msg_id"] == "ID47"

"""GTID algebra golden tests, ported 1:1 from the reference's unit tests.

MySQL GtidSet cases: /root/reference/src/providers/mysql/gtid/gtid_set.rs:84-292
MariaDB GtidList cases: /root/reference/src/providers/mariadb/gtid/gtid_list.rs:77-144
"""

import pytest

from mysql_cdc_spark.gtid import (
    Gtid,
    GtidError,
    GtidList,
    GtidSet,
    Interval,
    MariaGtid,
    Uuid,
)

SERVER_UUID1 = "24bc7850-2c16-11e6-a073-0242ac110001"
SERVER_UUID2 = "24bc7850-2c16-11e6-a073-0242ac110002"


def uuid1():
    return Uuid.parse(SERVER_UUID1)


def uuid2():
    return Uuid.parse(SERVER_UUID2)


class TestGtidSet:
    def test_parse_empty_string_returns_empty_gtid_set(self):
        gtid_set = GtidSet.parse("")
        assert len(gtid_set.uuid_sets) == 0
        assert str(gtid_set) == ""

    def test_add_gtids_lists_merged(self):
        gtid_set = GtidSet.parse(f"{SERVER_UUID1}:3-5")
        assert gtid_set.add_gtid(Gtid(uuid1(), 2))
        assert gtid_set.add_gtid(Gtid(uuid1(), 4)) is False
        assert gtid_set.add_gtid(Gtid(uuid1(), 5)) is False
        assert gtid_set.add_gtid(Gtid(uuid1(), 7))
        assert gtid_set.add_gtid(Gtid(uuid2(), 9))
        assert gtid_set.add_gtid(Gtid(uuid1(), 0))
        assert str(gtid_set) == f"{SERVER_UUID1}:0:2-5:7,{SERVER_UUID2}:9"

    def test_add_gtid_in_gap_intervals_joined(self):
        gtid_set = GtidSet.parse(f"{SERVER_UUID1}:3-4:6-7")
        gtid_set.add_gtid(Gtid(uuid1(), 5))
        assert str(gtid_set) == f"{SERVER_UUID1}:3-7"

    def test_raw_gtid_sets_equals_correctly(self):
        assert str(GtidSet.parse(f"{SERVER_UUID1}:1-191:192-199")) == str(
            GtidSet.parse(f"{SERVER_UUID1}:1-199")
        )
        assert str(GtidSet.parse(f"{SERVER_UUID1}:1-191:193-199")) != str(
            GtidSet.parse(f"{SERVER_UUID1}:1-199")
        )

    def test_simple_gtid_set_has_single_interval(self):
        gtid_set = GtidSet.parse(f"{SERVER_UUID1}:1-191")
        uuid_set = gtid_set.uuid_sets[SERVER_UUID1]
        assert len(uuid_set.intervals) == 1
        assert uuid_set.intervals[0] == Interval(1, 191)
        assert str(gtid_set) == f"{SERVER_UUID1}:1-191"

    def test_continuous_intervals_collapsed(self):
        gtid_set = GtidSet.parse(f"{SERVER_UUID1}:1-191:192-199")
        uuid_set = gtid_set.uuid_sets[SERVER_UUID1]
        assert len(uuid_set.intervals) == 1
        assert uuid_set.intervals[0] == Interval(1, 199)
        assert str(gtid_set) == f"{SERVER_UUID1}:1-199"

    def test_non_continuous_intervals_not_collapsed(self):
        gtid_set = GtidSet.parse(f"{SERVER_UUID1}:1-191:193-199")
        uuid_set = gtid_set.uuid_sets[SERVER_UUID1]
        assert [str(i) for i in uuid_set.intervals] == ["1-191", "193-199"]
        assert str(gtid_set) == f"{SERVER_UUID1}:1-191:193-199"

    def test_multiple_intervals_not_collapsed(self):
        gtid_set = GtidSet.parse(f"{SERVER_UUID1}:1-191:193-199:1000-1033")
        uuid_set = gtid_set.uuid_sets[SERVER_UUID1]
        assert [str(i) for i in uuid_set.intervals] == ["1-191", "193-199", "1000-1033"]
        assert str(gtid_set) == f"{SERVER_UUID1}:1-191:193-199:1000-1033"

    def test_multiple_intervals_some_collapsed(self):
        gtid_set = GtidSet.parse(
            f"{SERVER_UUID1}:1-191:192-199:1000-1033:1035-1036:1038-1039"
        )
        uuid_set = gtid_set.uuid_sets[SERVER_UUID1]
        assert [str(i) for i in uuid_set.intervals] == [
            "1-199",
            "1000-1033",
            "1035-1036",
            "1038-1039",
        ]
        assert str(gtid_set) == f"{SERVER_UUID1}:1-199:1000-1033:1035-1036:1038-1039"

    def test_multi_server_setup_has_single_intervals_trims_spaces(self):
        gtid_set = GtidSet.parse(f"{SERVER_UUID1}:1-3:11:47-49, {SERVER_UUID2}:1-19:55:56-100")
        assert len(gtid_set.uuid_sets) == 2
        us1 = gtid_set.uuid_sets[SERVER_UUID1]
        us2 = gtid_set.uuid_sets[SERVER_UUID2]
        assert [str(i) for i in us1.intervals] == ["1-3", "11", "47-49"]
        assert [str(i) for i in us2.intervals] == ["1-19", "55-100"]
        assert str(gtid_set) == f"{SERVER_UUID1}:1-3:11:47-49,{SERVER_UUID2}:1-19:55-100"

    # --- engine additions (not in reference): containment + union ---------

    def test_contains(self):
        gtid_set = GtidSet.parse(f"{SERVER_UUID1}:1-10:20-30")
        assert gtid_set.contains(SERVER_UUID1, 5)
        assert gtid_set.contains(SERVER_UUID1, 20)
        assert gtid_set.contains(SERVER_UUID1, 30)
        assert not gtid_set.contains(SERVER_UUID1, 11)
        assert not gtid_set.contains(SERVER_UUID1, 31)
        assert not gtid_set.contains(SERVER_UUID2, 5)

    def test_union(self):
        a = GtidSet.parse(f"{SERVER_UUID1}:1-10")
        b = GtidSet.parse(f"{SERVER_UUID1}:11-20:30-40,{SERVER_UUID2}:1")
        merged = a.union(b)
        assert str(merged) == f"{SERVER_UUID1}:1-20:30-40,{SERVER_UUID2}:1"
        # inputs untouched
        assert str(a) == f"{SERVER_UUID1}:1-10"

    def test_add_gtid_wrong_uuid_raises(self):
        gtid_set = GtidSet.parse(f"{SERVER_UUID1}:1-10")
        with pytest.raises(GtidError):
            gtid_set.uuid_sets[SERVER_UUID1].add_gtid(Gtid(uuid2(), 11))

    def test_to_intervals(self):
        gtid_set = GtidSet.parse(f"{SERVER_UUID2}:9,{SERVER_UUID1}:1-3:7")
        assert gtid_set.to_intervals() == [
            (SERVER_UUID1, 1, 3),
            (SERVER_UUID1, 7, 7),
            (SERVER_UUID2, 9, 9),
        ]


class TestGtidList:
    def test_parse_not_unique_domains(self):
        with pytest.raises(GtidError, match="unique domain ids"):
            GtidList.parse("1-1-270, 1-1-271")

    def test_parse_empty_string_returns_empty_gtid_list(self):
        gtid_list = GtidList.parse("")
        assert len(gtid_list.gtids) == 0
        assert str(gtid_list) == ""

    def test_parse_gtid_lists_returns_multiple_results(self):
        assert str(GtidList.parse("0-1-270")) == "0-1-270"
        assert str(GtidList.parse("1-2-120,2-3-130")) == "1-2-120,2-3-130"
        assert str(GtidList.parse("1-2-120, 2-3-130, 3-4-50")) == "1-2-120,2-3-130,3-4-50"

    def test_add_existing_domain_gtid_updated(self):
        gtid_list = GtidList.parse("0-1-270")
        assert gtid_list.add_gtid(MariaGtid(0, 1, 271)) is False
        assert len(gtid_list.gtids) == 1
        assert str(gtid_list) == "0-1-271"

    def test_add_new_domain_gtid_added(self):
        gtid_list = GtidList.parse("0-1-270")
        assert gtid_list.add_gtid(MariaGtid(1, 1, 271)) is True
        assert len(gtid_list.gtids) == 2
        assert str(gtid_list) == "0-1-270,1-1-271"

    def test_add_multi_domain_gtid_list_merged(self):
        gtid_list = GtidList.parse("1-2-120,2-3-130,3-4-50")
        gtid_list.add_gtid(MariaGtid(2, 4, 250))
        assert len(gtid_list.gtids) == 3
        assert str(gtid_list) == "1-2-120,2-4-250,3-4-50"


class TestTaggedGtids:
    """MySQL 8.4 tagged GTIDs (WL#15294; beyond-reference — the reference
    predates them): text parse/format/union/containment over
    ``uuid:tag:interval`` sets, keyed ``uuid:tag`` so the ledger anti-join
    and decode gtid_source text compose unchanged."""

    U = "24bc7850-2c16-11e6-a073-0242ac110002"
    V = "11111111-2222-3333-4444-555555555555"

    def test_parse_and_canonical_grouping(self):
        from mysql_cdc_spark.gtid import GtidSet

        s = GtidSet.parse(f"{self.U}:1-5:tag_a:1-3:TAG_B:7,{self.U}:8")
        # server-style grouping: untagged first, tags sorted, lowercase
        assert str(s) == f"{self.U}:1-5:8:tag_a:1-3:tag_b:7"
        assert str(GtidSet.parse(str(s))) == str(s)  # round-trip

    def test_tag_only_uuid(self):
        from mysql_cdc_spark.gtid import GtidSet

        s = GtidSet.parse(f"{self.V}:ops:1-9")
        assert str(s) == f"{self.V}:ops:1-9"
        assert s.contains(f"{self.V}:ops", 5)
        assert not s.contains(self.V, 5)  # untagged sequence is disjoint

    def test_add_gtid_and_idempotence(self):
        from mysql_cdc_spark.gtid import Gtid, GtidSet

        s = GtidSet.parse(f"{self.U}:tag_a:1-3")
        g = Gtid.parse(f"{self.U}:tag_a:4")
        assert s.add_gtid(g) is True
        assert s.add_gtid(g) is False  # uuid_set.rs:46-48 idempotence, tagged
        assert str(s) == f"{self.U}:tag_a:1-4"
        assert str(g) == f"{self.U}:tag_a:4"

    def test_union_and_intervals(self):
        from mysql_cdc_spark.gtid import GtidSet

        a = GtidSet.parse(f"{self.U}:1-5:tag_a:1-3")
        b = GtidSet.parse(f"{self.U}:tag_a:3-9:tag_c:1,{self.V}:2")
        u = a.union(b)
        assert str(u) == f"{self.V}:2,{self.U}:1-5:tag_a:1-9:tag_c:1"
        assert (f"{self.U}:tag_a", 1, 9) in u.to_intervals()
        assert (self.U, 1, 5) in u.to_intervals()

    def test_invalid_tag_rejected(self):
        import pytest as _pytest

        from mysql_cdc_spark.gtid import GtidError, GtidSet

        with _pytest.raises(GtidError):
            GtidSet.parse(f"{self.U}:9tag:1-3")  # tags cannot start with digit
        with _pytest.raises(GtidError):
            GtidSet.parse(f"{self.U}:tag_a")  # tag with no intervals

    def test_binary_encoders_refuse_tags(self):
        import pytest as _pytest

        from mysql_cdc_spark.binlog.encoder import BinlogWriter
        from mysql_cdc_spark.binlog.wire import encode_dump_binlog_gtid_command
        from mysql_cdc_spark.gtid import GtidSet

        tagged = GtidSet.parse(f"{self.U}:tag_a:1-3")
        with _pytest.raises(ValueError):
            BinlogWriter("binlog.000001").write_prev_gtids(tagged)
        with _pytest.raises(ValueError):
            encode_dump_binlog_gtid_command(1, "", 4, tagged)

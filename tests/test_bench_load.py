"""Machine-load accounting in bench.py (VERDICT r7 item 2).

Round 7's committed bench read as a +21.7% regression that judge re-timing
showed was mostly driver-box load. These tests pin the accounting that lets
the artifact self-annotate: /proc/stat parsing, external-CPU attribution
(system busy minus our own process tree), and the idle-verdict flag rule.
No Spark needed.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (
    IDLE_EXT_SHARE_MAX,
    IDLE_IOWAIT_SHARE_MAX,
    IDLE_LOAD1_MAX,
    _descendant_pids,
    external_shares,
    idle_verdict,
    load_snapshot,
    parse_proc_stat,
)

# user nice system idle iowait irq softirq steal guest guest_nice
PROC_STAT = "cpu  100 0 50 800 40 5 5 0 0 0\ncpu0 1 2 3 4 5 6 7 8 9 10\n"


def test_parse_proc_stat_buckets():
    s = parse_proc_stat(PROC_STAT)
    assert s["total"] == 1000.0
    assert s["iowait"] == 40.0
    # busy excludes idle AND iowait
    assert s["busy"] == 1000.0 - 800.0 - 40.0


def test_parse_proc_stat_short_line():
    # older kernels emit fewer fields; missing ones count as zero
    s = parse_proc_stat("cpu 10 0 10 80\n")
    assert s["total"] == 100.0 and s["busy"] == 20.0 and s["iowait"] == 0.0


def test_external_share_attributes_only_foreign_cpu():
    pre = {"busy": 100.0, "iowait": 0.0, "total": 1000.0, "tree": 50.0}
    # machine did 300 busy jiffies over a 1000-jiffy window; our tree did 250
    post = {"busy": 400.0, "iowait": 20.0, "total": 2000.0, "tree": 300.0}
    s = external_shares(pre, post)
    assert s["external_cpu_share"] == round(50.0 / 1000.0, 4)
    assert s["iowait_share"] == round(20.0 / 1000.0, 4)


def test_external_share_clamps_negative():
    # tree jiffies can slightly exceed system busy deltas (sampling skew);
    # never report a negative share
    pre = {"busy": 100.0, "iowait": 0.0, "total": 1000.0, "tree": 0.0}
    post = {"busy": 150.0, "iowait": 0.0, "total": 2000.0, "tree": 60.0}
    assert external_shares(pre, post)["external_cpu_share"] == 0.0


def test_external_share_zero_window():
    pre = post = {"busy": 1.0, "iowait": 0.0, "total": 1.0, "tree": 0.0}
    s = external_shares(pre, post)
    assert s == {"external_cpu_share": 0.0, "iowait_share": 0.0}


def test_idle_verdict_flag_rule():
    ok = {"external_cpu_share": 0.0, "iowait_share": 0.0}
    assert idle_verdict(0.2, ok) == (True, [])
    # each signal trips independently, at strictly-above threshold
    assert idle_verdict(IDLE_LOAD1_MAX, ok)[0] is True
    idle, why = idle_verdict(IDLE_LOAD1_MAX + 0.01, ok)
    assert not idle and "load1" in why[0]
    idle, why = idle_verdict(0.0, {"external_cpu_share": IDLE_EXT_SHARE_MAX + 0.001, "iowait_share": 0.0})
    assert not idle and "external" in why[0]
    idle, why = idle_verdict(0.0, {"external_cpu_share": 0.0, "iowait_share": IDLE_IOWAIT_SHARE_MAX + 0.001})
    assert not idle and "iowait" in why[0]
    # multiple reasons accumulate
    idle, why = idle_verdict(9.9, {"external_cpu_share": 0.5, "iowait_share": 0.5})
    assert not idle and len(why) == 3


def test_live_snapshot_shape():
    snap = load_snapshot()
    assert snap is not None  # linux container: /proc is there
    assert set(snap) == {"busy", "iowait", "total", "tree"}
    assert snap["total"] > snap["busy"] >= 0


def test_descendant_pids_sees_child_process():
    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(20)"])
    try:
        time.sleep(0.2)
        pids = _descendant_pids()
        assert os.getpid() in pids
        assert child.pid in pids
    finally:
        child.kill()
        child.wait()


def test_tree_cpu_grows_when_we_burn_cpu():
    pre = load_snapshot()
    t0 = time.process_time()
    while time.process_time() - t0 < 0.3:
        sum(i * i for i in range(10000))
    post = load_snapshot()
    assert post["tree"] > pre["tree"]
    # and the burn is attributed to US, not to external load
    s = external_shares(pre, post)
    assert s["external_cpu_share"] < 0.9  # our own burn never reads as ~all-external

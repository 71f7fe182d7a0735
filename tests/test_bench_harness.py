"""The bench harness's evidence-preservation contract (round 4).

Round 3's artifact was rc=124/tail="" because a timeout destroyed all
output.  These tests pin the two structural fixes: a timed-out
subprocess's partial stdout is salvaged line by line, and the headline
emitter always prints one parseable JSON line whose LAST occurrence is
the most complete snapshot."""

import json
import sys

import bench


def test_run_sub_salvages_partial_output_on_timeout():
    """A child that prints a JSON line, flushes, then hangs must still
    yield that line (subprocess.TimeoutExpired.stdout salvage)."""
    # -S skips site/sitecustomize: this machine's sitecustomize can
    # take seconds to import, racing the timeout
    child = [sys.executable, '-S', '-c',
             'import json,sys,time;'
             'print(json.dumps({"section": "a", "x": 1}), flush=True);'
             'time.sleep(60)']
    submodes = {}
    out = bench._run_sub(['--fake'], 8, submodes, all_lines=True,
                         exe=child)
    assert out == [{'section': 'a', 'x': 1}]
    assert submodes['fake']['status'].startswith('timeout@')


def test_run_sub_last_line_wins_and_status_ok():
    child = [sys.executable, '-S', '-c',
             'import json;'
             'print(json.dumps({"v": 1}));'
             'print(json.dumps({"v": 2}))']
    submodes = {}
    out = bench._run_sub(['--fake'], 30, submodes, exe=child)
    assert out == {'v': 2}
    assert submodes['fake']['status'] == 'ok'


def test_run_sub_failure_is_diagnosable():
    child = [sys.executable, '-S', '-c',
             'import sys; print("boom", file=sys.stderr); sys.exit(3)']
    submodes = {}
    out = bench._run_sub(['--fake'], 30, submodes, exe=child)
    assert out is None
    assert 'boom' in submodes['fake']['status']


def test_overlapped_suite_handshake_and_collect():
    """The round-5 overlap protocol: the child prints its warm line,
    blocks on stdin for 'go <budget>', then runs its sections; the
    collector must deliver every line and record ok."""
    child = [sys.executable, '-S', '-c',
             'import json,sys;'
             'print(json.dumps({"section": "warm"}), flush=True);'
             'line = sys.stdin.readline().split();'
             'assert line[0] == "go" and float(line[1]) > 0, line;'
             'print(json.dumps({"section": "hetero"}), flush=True)']
    submodes = {}
    collect = bench._spawn_suite_overlapped(submodes, exe=child)
    out = collect(30)
    assert out == [{'section': 'warm'}, {'section': 'hetero'}]
    assert submodes['device-suite']['status'] == 'ok'


def test_overlapped_suite_salvages_on_timeout():
    """A child that hangs after warm must still yield the warm line,
    with a timeout status."""
    child = [sys.executable, '-S', '-c',
             'import json,sys,time;'
             'print(json.dumps({"section": "warm"}), flush=True);'
             'sys.stdin.readline();'
             'time.sleep(120)']
    submodes = {}
    collect = bench._spawn_suite_overlapped(submodes, exe=child)
    out = collect(3)
    assert out == [{'section': 'warm'}]
    assert submodes['device-suite']['status'].startswith('timeout@')


def test_emit_prints_parseable_headline(capsys):
    detail = {'k': 1}
    bench._emit(detail, None, 10.0, 100.0)     # host 10 MB/s
    bench._emit(detail, 5.0, 10.0, 100.0)      # hetero 20 MB/s wins
    lines = [l for l in capsys.readouterr().out.splitlines()
             if l.startswith('{')]
    assert len(lines) == 2
    first, second = (json.loads(l) for l in lines)
    assert first['value'] == 10.0 and 'host pipeline' in first['metric']
    assert second['value'] == 20.0 and 'hetero' in second['metric']
    assert second['detail'] == detail

"""Argument-handling tests ported from the reference
tests/test_script_arguments.py (kfile space checks, table factories,
memory settings)."""

import collections
import io
import os
import sys
from io import StringIO

import pytest

from khmer_tpu import kfile, khmer_args

from .conftest import REF_TEST_DATA


def _data(name):
    return os.path.join(REF_TEST_DATA, name)


def test_check_space():
    fakelump_fa = _data('fakelump.fa')

    save_stderr, sys.stderr = sys.stderr, io.StringIO()
    try:
        kfile.check_space(
            [fakelump_fa], force=False, _testhook_free_space=0)
        assert 0, "this should fail"
    except SystemExit as e:
        print(str(e))
    finally:
        sys.stderr = save_stderr


@pytest.mark.parametrize('graph_type,buckets_per_byte', [
    ('countgraph', 1),
    ('smallcountgraph', 2),
    ('nodegraph', 8),
])
def test_check_tablespace(graph_type, buckets_per_byte):
    oldstderr = sys.stderr
    sys.stderr = StringIO()

    outfile = _data('truncated.fq')
    parser = khmer_args.build_counting_args()
    args = parser.parse_args(['-M', '16G'])

    buckets_per_table = khmer_args.calculate_graphsize(args, graph_type)
    total_buckets = buckets_per_table * args.n_tables
    space_needed = total_buckets / buckets_per_byte

    # insufficient space: message on stderr, exit code 1 (reference
    # kfile prints then sys.exit(1))
    with pytest.raises(SystemExit) as se:
        kfile.check_space_for_graph(outfile, space_needed, force=False,
                                    _testhook_free_space=10e9)
    assert se.value.code == 1
    assert 'ERROR: Not enough free space' in sys.stderr.getvalue()
    sys.stderr = StringIO()

    # insufficient space, force mode
    kfile.check_space_for_graph(outfile, space_needed, force=True,
                                _testhook_free_space=10e9)
    assert 'WARNING: Not enough free space' in sys.stderr.getvalue()

    # sufficient space
    sys.stderr = StringIO()
    kfile.check_space_for_graph(outfile, space_needed, force=False,
                                _testhook_free_space=20e9)
    assert sys.stderr.getvalue() == ''
    sys.stderr = oldstderr


@pytest.mark.parametrize('graph_type,exp_buckets', [
    ('qfcounttable', '2.4 million buckets'),
    ('countgraph', '3.0 million buckets'),
    ('smallcountgraph', '6.0 million buckets'),
    ('nodegraph', '24.0 million buckets'),
])
def test_check_tablespace_nodegraph(graph_type, exp_buckets):
    parser = khmer_args.build_counting_args()
    args = parser.parse_args(['-M', '3G'])
    buckets_per_table = khmer_args.calculate_graphsize(args, graph_type)
    total_buckets = buckets_per_table * args.n_tables
    sizestr = '{:.1f} million buckets'.format(float(total_buckets) / 1e9)
    assert sizestr == exp_buckets


def test_normal_help(capsys):
    # check -x and -N are hidden by default with --help
    parser = khmer_args.build_graph_args()

    with pytest.raises(SystemExit):
        parser.parse_args(['-h'])

    out, err = capsys.readouterr()
    assert "--max-tablesize" not in out
    assert '--n_tables' not in out


def test_check_space_force():
    fakelump_fa = _data('fakelump.fa')

    save_stderr, sys.stderr = sys.stderr, io.StringIO()
    try:
        kfile.check_space(
            [fakelump_fa], force=True, _testhook_free_space=0)
        assert True, "this should pass"
    except SystemExit as e:
        print(str(e))
    finally:
        sys.stderr = save_stderr


def test_check_tablespace_force(tmp_path):
    save_stderr, sys.stderr = sys.stderr, io.StringIO()

    outfile = str(tmp_path / 'truncated')

    parser = khmer_args.build_counting_args()
    args = parser.parse_args(['-M', '1e9'])

    try:
        tablesize = khmer_args.calculate_graphsize(args, 'countgraph')
        kfile.check_space_for_graph(outfile, tablesize,
                                    True, _testhook_free_space=0)
        assert True, "this should pass"
    except SystemExit as e:
        print(str(e))
    finally:
        sys.stderr = save_stderr


def test_invalid_file_warn():
    save_stderr, sys.stderr = sys.stderr, io.StringIO()
    try:
        kfile.check_valid_file_exists(["nonexistent", "nonexistent2"])
        assert sys.stderr.getvalue().count("\n") == 2,  \
            "Should produce two warning lines"
    except SystemExit as e:
        print(str(e))
    finally:
        sys.stderr = save_stderr


def test_check_valid_stdin_nowarn():
    save_stderr, sys.stderr = sys.stderr, io.StringIO()
    try:
        kfile.check_valid_file_exists(["-"])
        err = sys.stderr.getvalue()
        assert err.count("\n") == 0, err
    except SystemExit as e:
        print(str(e))
    finally:
        sys.stderr = save_stderr


FakeArgparseObject = collections.namedtuple('FakeArgs',
                                            ['ksize', 'n_tables',
                                             'max_tablesize',
                                             'max_memory_usage',
                                             'unique_kmers',
                                             'small_count',
                                             'hash_function',
                                             'force'])


def _fake_args(**kw):
    defaults = dict(ksize=khmer_args.DEFAULT_K,
                    n_tables=khmer_args.DEFAULT_N_TABLES,
                    max_tablesize=khmer_args.DEFAULT_MAX_TABLESIZE,
                    max_memory_usage=1e7,
                    unique_kmers=0,
                    small_count=False,
                    hash_function='twobit-exact',
                    force=0)
    defaults.update(kw)
    return FakeArgparseObject(**defaults)


def test_create_countgraph_1():
    args = _fake_args()

    countgraph = khmer_args.create_countgraph(args)
    expected_hashsz = [2499997, 2499989, 2499983, 2499967]
    assert countgraph.hashsizes() == expected_hashsz, countgraph.hashsizes()
    assert sum(countgraph.hashsizes()) < 1e7, sum(countgraph.hashsizes())


def test_create_countgraph_2():
    args = _fake_args()

    countgraph = khmer_args.create_countgraph(args, ksize=15)
    assert countgraph.ksize() == 15


def test_create_countgraph_3():
    args = _fake_args()

    old_stderr = sys.stderr
    sys.stderr = capture = StringIO()

    try:
        khmer_args.create_countgraph(args, ksize=35)
        assert 0, "should not reach this"
    except SystemExit:
        err = capture.getvalue()
        assert 'only supports k-mer sizes <= 32' in err, err
    finally:
        sys.stderr = old_stderr


def test_create_countgraph_4():
    args = _fake_args(n_tables=21)

    old_stderr = sys.stderr
    sys.stderr = capture = StringIO()

    try:
        khmer_args.create_countgraph(args, ksize=None)
        assert 0, "should not reach this"
    except SystemExit:
        err = capture.getvalue()
        assert 'khmer only supports number of tables <= 20.' in err, err
    finally:
        sys.stderr = old_stderr


def test_create_countgraph_5():
    args = _fake_args(n_tables=21, force=1)

    old_stderr = sys.stderr
    sys.stderr = capture = StringIO()

    try:
        khmer_args.create_countgraph(args, ksize=None)
        message = "Warning: Maximum recommended number of tables is 20, " + \
                  "discarded by force nonetheless!"
        assert message in capture.getvalue()
    except SystemExit as e:
        print(str(e))
    finally:
        sys.stderr = old_stderr


def test_create_countgraph_4_multiplier():
    args = _fake_args()

    countgraph = khmer_args.create_countgraph(args, multiplier=2.0)
    assert sum(countgraph.hashsizes()) < 1e7 * 2.0, \
        sum(countgraph.hashsizes())


def test_create_nodegraph_1():
    args = _fake_args()

    nodegraph = khmer_args.create_nodegraph(args)
    expected_hashsz = [19999999, 19999981, 19999963, 19999927]
    assert nodegraph.hashsizes() == expected_hashsz, nodegraph.hashsizes()

    assert sum(nodegraph.hashsizes()) / 8.0 < 1e7, \
        sum(nodegraph.hashsizes())


def test_create_nodegraph_2():
    args = _fake_args()

    nodegraph = khmer_args.create_nodegraph(args, ksize=15)
    assert nodegraph.ksize() == 15


def test_create_nodegraph_3():
    args = _fake_args()

    old_stderr = sys.stderr
    sys.stderr = capture = StringIO()

    try:
        khmer_args.create_nodegraph(args, ksize=35)
        assert 0, "should not reach this"
    except SystemExit:
        err = capture.getvalue()
        assert 'only supports k-mer sizes <= 32.' in err, err
    finally:
        sys.stderr = old_stderr


def test_create_nodegraph_4():
    args = _fake_args(n_tables=21)

    old_stderr = sys.stderr
    sys.stderr = capture = StringIO()

    try:
        khmer_args.create_nodegraph(args, ksize=None)
        assert 0, "should not reach this"
    except SystemExit:
        err = capture.getvalue()
        assert 'khmer only supports number of tables <= 20.' in err, err
    finally:
        sys.stderr = old_stderr


def test_create_nodegraph_5():
    args = _fake_args(n_tables=21, force=1)

    old_stderr = sys.stderr
    sys.stderr = capture = StringIO()

    try:
        khmer_args.create_nodegraph(args, ksize=None)
        message = "Warning: Maximum recommended number of tables is 20, " + \
                  "discarded by force nonetheless!"
        assert message in capture.getvalue()
    except SystemExit as e:
        print(str(e))
    finally:
        sys.stderr = old_stderr


def test_create_nodegraph_4_multiplier():
    args = _fake_args()

    nodegraph = khmer_args.create_nodegraph(args, multiplier=2.0)
    assert sum(nodegraph.hashsizes()) / 8.0 < 1e7 * 2.0, \
        sum(nodegraph.hashsizes())


def test_report_on_config_bad_graphtype():
    args = _fake_args()

    try:
        khmer_args.report_on_config(args, 'foograph')
        assert 0, "the previous statement should raise an exception"
    except ValueError as err:
        assert "unknown graph type: foograph" in str(err), str(err)


def test_fail_calculate_foograph_size():
    args = _fake_args()

    try:
        khmer_args.calculate_graphsize(args, 'foograph')
        assert 0, "previous statement should fail"
    except ValueError as err:
        assert "unknown graph type: foograph" in str(err), str(err)


def test_memory_setting():
    assert khmer_args.memory_setting('1') == 1.0
    assert khmer_args.memory_setting('42') == 42.0
    assert khmer_args.memory_setting('10000') == 1e4
    assert khmer_args.memory_setting('2.3e5') == 230000.0
    assert khmer_args.memory_setting('1e9') == 1e9
    assert khmer_args.memory_setting('1K') == 1e3
    assert khmer_args.memory_setting('3.14m') == 3.14e6
    assert khmer_args.memory_setting('8G') == 8e9
    assert khmer_args.memory_setting('8g') == 8e9
    assert khmer_args.memory_setting('16T') == 16e12
    for bad in ('16Tb', '16E', '16Ki', 'b0gu$G'):
        try:
            khmer_args.memory_setting(bad)
            assert False, 'previous command should have failed'
        except ValueError as err:
            assert 'cannot parse memory setting' in str(err)


def test_expert_help(capsys):
    # -x and -N are hidden by default but appear with --help-expert
    import sys as _sys

    from khmer_tpu import khmer_args

    old_argv = _sys.argv[:]
    _sys.argv.append('--help-expert')
    parser = khmer_args.build_graph_args()

    with pytest.raises(SystemExit):
        parser.parse_args(['-h', '--help-expert'])

    out, err = capsys.readouterr()
    assert "--max-tablesize" in out
    assert '--n_tables' in out

    _sys.argv = old_argv

"""Memory/size estimation solver checks (reference expectations from
tests/test_oxli_functions.py, table-driven)."""

import pytest

from khmer_tpu.khmer_args import (estimate_optimal_with_K_and_M,
                                  estimate_optimal_with_K_and_f,
                                  graphsize_args_report, optimal_size)

# (fn, input kmers, constraint) -> (num_htables, htable_size, mem_use,
#                                   fp_rate, fp_tolerance)
CASES = [
    (estimate_optimal_with_K_and_M, 99, 1024, 7, 146, 1022, .008, .001),
    (estimate_optimal_with_K_and_f, 99, 0.00701925498897,
     7, 145, 1015, .008, .002),
    (estimate_optimal_with_K_and_M, 1024, 2, 1, 2, 2, 1.0, 1e-9),
    (estimate_optimal_with_K_and_f, 1024, 0.7, 1, 850, 850, .7, .0022),
]


@pytest.mark.parametrize(
    "fn,kmers,constraint,n_ht,size,mem,fp,tol", CASES)
def test_estimate_solver(fn, kmers, constraint, n_ht, size, mem, fp, tol):
    res = fn(kmers, constraint)
    # positional and namedtuple access must agree
    assert res[0] == res.num_htables == n_ht
    assert res[1] == res.htable_size == size
    assert res[2] == res.mem_use == mem
    assert abs(fp - res.fp_rate) < tol + 1e-12, res.fp_rate


@pytest.mark.parametrize("kwargs,n_ht,size", [
    (dict(mem_cap=1024), 7, 146),
    (dict(fp_rate=0.00701925498897), 7, 145),
])
def test_optimal_size_dispatch(kwargs, n_ht, size):
    res = optimal_size(99, **kwargs)
    assert (res.num_htables, res.htable_size) == (n_ht, size)


@pytest.mark.parametrize("kwargs", [
    dict(mem_cap=1024, fp_rate=0.00701925498897),  # both set
    dict(),                                        # neither set
])
def test_optimal_size_requires_exactly_one(kwargs):
    with pytest.raises(TypeError) as err:
        optimal_size(99, **kwargs)
    assert "num_kmers and either mem_cap or fp_rate" in str(err.value)


def test_report_text_renders():
    graphsize_args_report(99, 0.00701925498897)


# -- round 3: the reference's test_oxli_functions.py cases under their
# original names.

from khmer_tpu.khmer_args import (estimate_optimal_with_K_and_M,  # noqa: E402
                                  graphsize_args_report,
                                  estimate_optimal_with_K_and_f, optimal_size)


def test_estimate_functions_1():
    res = estimate_optimal_with_K_and_M(99, 1024)
    assert res[0] == 7, res[0]
    assert res[1] == 146, res[1]
    assert res[2] == 1022, res[2]
    assert abs(.008 - res[3]) < .001, res[3]

    res = estimate_optimal_with_K_and_f(99, 0.00701925498897)
    assert res[0] == 7, res[0]
    assert res[1] == 145, res[1]
    assert res[2] == 1015, res[2]
    assert abs(.008 - res[3]) < .002, res[3]

    res = estimate_optimal_with_K_and_M(1024, 2)
    assert res[0] == 1, res[0]
    assert res[1] == 2, res[1]
    assert res[2] == 2, res[2]
    assert res[3] == 1.0, res[3]

    # a crazy high FP rate just for coverage
    res = estimate_optimal_with_K_and_f(1024, 0.7)
    assert res[0] == 1, res[0]
    assert res[1] == 850, res[1]
    assert res[2] == 850, res[2]
    assert abs(.7 - res[3]) < 0.0022, abs(.7 - res[3])


def test_estimate_functions_namedtup():
    res = estimate_optimal_with_K_and_M(99, 1024)
    assert res.num_htables == 7, res[0]
    assert res.htable_size == 146, res[1]
    assert res.mem_use == 1022, res[2]
    assert abs(.008 - res.fp_rate) < .001, res[3]

    res = estimate_optimal_with_K_and_f(99, 0.00701925498897)
    assert res.num_htables == 7, res[0]
    assert res.htable_size == 145, res[1]
    assert res.mem_use == 1015, res[2]
    assert abs(.008 - res.fp_rate) < .002, res[3]


def test_optimal_size_function():
    res = optimal_size(99, mem_cap=1024)
    assert res.num_htables == 7, res[0]
    assert res.htable_size == 146, res[1]
    assert res.mem_use == 1022, res[2]
    assert abs(.008 - res.fp_rate) < .001, res[3]

    res = optimal_size(99, fp_rate=0.00701925498897)
    assert res.num_htables == 7, res[0]
    assert res.htable_size == 145, res[1]
    assert res.mem_use == 1015, res[2]
    assert abs(.008 - res.fp_rate) < .002, res[3]

    try:
        optimal_size(99, mem_cap=1024, fp_rate=0.00701925498897)
        assert 0, "this should fail"
    except TypeError as err:
        assert "num_kmers and either mem_cap or fp_rate" in str(err)

    try:
        optimal_size(99)
        assert 0, "this should fail"
    except TypeError as err:
        assert "num_kmers and either mem_cap or fp_rate" in str(err)


def test_output_gen():
    graphsize_args_report(99, 0.00701925498897)

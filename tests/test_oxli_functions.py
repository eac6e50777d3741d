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

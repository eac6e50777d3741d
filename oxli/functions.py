"""A collection of functions for use throughout khmer-tpu/oxli.

Parity: reference oxli/functions.py:42-66.  The reference fans N host
threads at one shared sketch; on TPU the device batch pipeline IS the
parallelism, so num_threads is accepted for compatibility and the
consume happens through the (native-loader-backed) bulk path.
"""


def build_graph(ifilenames, graph, num_threads=1, tags=False):
    """Construct a counting graph from a set of input files.

    - ifilenames: list of input files
    - graph: existing graph
    - num_threads: accepted for API compatibility
    - tags: should there be tags
    """
    if tags:
        eat = graph.consume_seqfile_and_tag
    else:
        eat = graph.consume_seqfile

    for ifile in ifilenames:
        eat(ifile)


def estimate_optimal_with_K_and_M(num_kmers, mem_cap):
    from khmer_tpu.khmer_args import estimate_optimal_with_K_and_M as f

    return f(num_kmers, mem_cap)


def estimate_optimal_with_K_and_f(num_kmers, des_fp_rate):
    from khmer_tpu.khmer_args import estimate_optimal_with_K_and_f as f

    return f(num_kmers, des_fp_rate)


def optimal_size(num_kmers, mem_cap=None, fp_rate=None):
    from khmer_tpu.khmer_args import optimal_size as f

    return f(num_kmers, mem_cap=mem_cap, fp_rate=fp_rate)

"""Partition-subset worker (parity: reference oxli/partition.py:22-45).

The queue/worker shape is retained for script compatibility; each
worker's subset BFS runs seed-batched on the device.
"""

import gc
import os
import queue
import sys


def worker(que, basename, stop_big_traversals):
    while True:
        try:
            (nodegraph, index, start, stop) = que.get(False)
        except queue.Empty:
            print('exiting', file=sys.stderr)
            return

        outfile = basename + '.subset.%d.pmap' % (index,)
        if os.path.exists(outfile):
            print('SKIPPING', outfile, ' -- already exists',
                  file=sys.stderr)
            continue

        print('starting:', basename, index, file=sys.stderr)

        # pay attention to stoptags when partitioning; take command line
        # direction on whether or not to exhaustively traverse.
        subset = nodegraph.do_subset_partition(start, stop, True,
                                               stop_big_traversals)

        print('saving:', basename, index, file=sys.stderr)
        subset.save_partitionmap(outfile)
        del subset
        gc.collect()

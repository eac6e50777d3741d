"""Utilities for pipelined processing of short reads.

Parity: reference khmer/thread_utils.py:66-230.  The reference drives a
reader -> N workers -> writer queue pipeline; here the pipeline's role
is to keep the host-side record transforms off the critical device
path.  The queue/worker structure and diagnostics match the reference
(process_fn contract: record -> (name, trimmed_seq) or (None, None)).
"""

import sys
import threading
import queue

from khmer_tpu.io.fastx import FastxReader, Read
from khmer_tpu.khmer_logger import log_info
from khmer_tpu.utils import check_is_pair, write_record

DEFAULT_WORKER_THREADS = 8
DEFAULT_GROUPSIZE = 100


def verbose_loader(filename):
    """Read iterator that additionally prints progress info to stderr."""
    for num, record in enumerate(FastxReader(filename)):
        if num % 100000 == 0:
            log_info('... filtering {num}', num=num)
        yield record


verbose_fasta_iter = verbose_loader  # pylint: disable=invalid-name


class SequenceGroup(object):

    def __init__(self, order, seqlist):
        self.order = order
        self.seqlist = seqlist


class ThreadedSequenceProcessor(object):
    # pylint: disable=too-many-instance-attributes
    QUEUESIZE = 50

    def __init__(self, process_fn, n_workers=DEFAULT_WORKER_THREADS,
                 group_size=DEFAULT_GROUPSIZE, verbose=True):
        self.process_fn = process_fn
        self.n_workers = n_workers
        self.group_size = group_size

        self.inqueue = queue.Queue(self.QUEUESIZE)
        self.outqueue = queue.Queue(self.QUEUESIZE)

        self.worker_count = 0
        self.worker_count_lock = threading.Lock()
        self.done = False
        self.verbose = verbose

        self.n_processed = 0
        self.n_written = 0
        self.bp_processed = 0
        self.bp_written = 0
        self.tallies_lock = threading.Lock()

    def start(self, inputiter, outfp):
        if self.verbose:
            print('starting threads', file=sys.stderr)

        try:
            for _ in range(self.n_workers):
                thread = threading.Thread(target=self.do_process)
                self.worker_count += 1
                thread.start()

            if self.verbose:
                print('starting writer', file=sys.stderr)

            writer = threading.Thread(target=self.do_write, args=(outfp,))
            writer.start()

            if self.verbose:
                print('loading...', file=sys.stderr)

            self.push_sequences(inputiter)

            if self.verbose:
                print('done loading in sequences', file=sys.stderr)
            self.done = True

            writer.join()
        except Exception:
            self.done = True
            raise

    def push_sequences(self, inputiter):
        batch = []
        last_record = None
        i = 0
        for record in inputiter:
            if i >= self.group_size:
                # keep pairs together in batches, to retain interleaving
                if check_is_pair(last_record, record):
                    batch.append(record)
                    self.inqueue.put(SequenceGroup(0, batch))
                    batch = []
                else:
                    self.inqueue.put(SequenceGroup(0, batch))
                    batch = [record]
                i = 0
            else:
                batch.append(record)

            last_record = record
            i += 1

        if batch:
            self.inqueue.put(SequenceGroup(0, batch))

    def do_process(self):
        try:
            self._do_process()
        finally:
            # always decrement, even if process_fn raised — otherwise
            # the writer never observes worker_count hitting zero
            with self.worker_count_lock:
                self.worker_count -= 1

    def _do_process(self):
        inq = self.inqueue

        while not self.done or not inq.empty():
            try:
                grouping = inq.get(True, 1)
            except queue.Empty:
                continue

            bp_processed = 0
            bp_written = 0

            keep = []
            for record in grouping.seqlist:
                name, sequence = self.process_fn(record)
                bp_processed += len(record.sequence)
                if name:
                    quality = None
                    if getattr(record, 'quality', None) is not None:
                        quality = record.quality[:len(sequence)]
                    bp_written += len(sequence)
                    keep.append((name, sequence, quality))

            self.outqueue.put(SequenceGroup(0, keep))

            with self.tallies_lock:
                self.n_processed += len(grouping.seqlist)
                self.n_written += len(keep)
                self.bp_processed += bp_processed
                self.bp_written += bp_written

                if self.verbose and self.n_processed % 500000 == 0:
                    print("processed %d / wrote %d / removed %d" %
                          (self.n_processed, self.n_written,
                           self.n_processed - self.n_written),
                          file=sys.stderr)

    def do_write(self, outfp):
        outq = self.outqueue
        while self.worker_count > 0 or not outq.empty():
            try:
                grouping = outq.get(True, 1)
            except queue.Empty:
                continue

            for name, seq, qual in grouping.seqlist:
                if qual:
                    record = Read(name=name, sequence=seq, quality=qual)
                else:
                    record = Read(name=name, sequence=seq)
                write_record(record, outfp)

        if self.verbose:
            print("DONE writing.\nprocessed %d / wrote %d / removed %d" %
                  (self.n_processed, self.n_written,
                   self.n_processed - self.n_written), file=sys.stderr)
            print("processed %d bp / wrote %d bp / removed %d bp" %
                  (self.bp_processed, self.bp_written,
                   self.bp_processed - self.bp_written), file=sys.stderr)
            if self.bp_processed:
                discarded = self.bp_processed - self.bp_written
                percent = float(discarded) / float(self.bp_processed) * 100
                print("discarded %.1f%%" % percent, file=sys.stderr)

"""ThreadedSequenceProcessor tests, ported from the reference
tests/test_threaded_sequence_processor.py."""

import queue
from io import StringIO

from khmer_tpu.io.fastx import Read
from khmer_tpu.thread_utils import SequenceGroup, ThreadedSequenceProcessor


def _fasta_records(text):
    out = []
    name = None
    seq = []
    for line in text.splitlines():
        if line.startswith('>'):
            if name is not None:
                out.append((name, ''.join(seq)))
            name = line[1:]
            seq = []
        elif line:
            seq.append(line)
    if name is not None:
        out.append((name, ''.join(seq)))
    return out


def load_records(stringio_fp):
    return _fasta_records(stringio_fp.getvalue())


def load_records_fastq(stringio_fp):
    lines = stringio_fp.getvalue().splitlines()
    out = []
    for i in range(0, len(lines) - 3, 4):
        out.append({'name': lines[i][1:], 'sequence': lines[i + 1],
                    'quality': lines[i + 3]})
    return out


def load_records_d(stringio_fp):
    return dict(load_records(stringio_fp))


def idem(record):
    return record['name'], record['sequence']


odd_counter = 0


def every_other(record):
    global odd_counter
    odd_counter += 1
    if odd_counter % 2 == 1:
        return None, None

    return record['name'], record['sequence']


def test_basic():
    tsp = ThreadedSequenceProcessor(idem, 1, 1, verbose=False)

    inseqs = [Read(name='a', sequence='AAA'),
              Read(name='b', sequence='TTT')]
    outfp = StringIO()

    tsp.start(inseqs, outfp)

    x = load_records_d(outfp)
    assert len(x) == 2, x
    assert x['a'] == 'AAA'
    assert x['b'] == 'TTT'


def test_basic_fastq_like():
    tsp = ThreadedSequenceProcessor(idem, 1, 1, verbose=False)

    inseqs = [Read(name='a', sequence='AAA', quality='###'),
              Read(name='b', sequence='TTT', quality='###')]
    outfp = StringIO()

    tsp.start(inseqs, outfp)

    x = load_records_fastq(outfp)
    assert x
    for i in x:
        assert i['quality'] == '###'


def test_odd():
    global odd_counter
    odd_counter = 0
    tsp = ThreadedSequenceProcessor(every_other, 1, 1, verbose=False)

    inseqs = [Read(name='a', sequence='AAA'),
              Read(name='b', sequence='TTT')]
    outfp = StringIO()

    tsp.start(inseqs, outfp)

    x = load_records_d(outfp)
    assert len(x) == 1, x
    assert x['b'] == 'TTT'


def test_basic_2thread():
    tsp = ThreadedSequenceProcessor(idem, 2, 1, verbose=False)

    inseqs = [Read(name='a', sequence='AAA'),
              Read(name='b', sequence='TTT')]
    outfp = StringIO()

    tsp.start(inseqs, outfp)

    x = load_records_d(outfp)
    assert len(x) == 2, x
    assert x['a'] == 'AAA'
    assert x['b'] == 'TTT'


def test_paired_2thread():
    class TSPTestPairedProcess(ThreadedSequenceProcessor):
        # do_process that ensures paired ends are kept together

        def do_process(self):
            inq = self.inqueue

            while not self.done or not inq.empty():
                try:
                    g = inq.get(True, 1)
                except queue.Empty:
                    continue

                assert len(g.seqlist) == 2
                first_rec = g.seqlist[0]
                second_rec = g.seqlist[1]

                assert first_rec['name'][:-1] == second_rec['name'][:-1]
                assert first_rec['name'][-1] == '1'
                assert second_rec['name'][-1] == '2'

                keep = []
                for record in g.seqlist:
                    name, sequence = self.process_fn(record)
                    if name:
                        keep.append((name, sequence, None))

                self.outqueue.put(SequenceGroup(0, keep))

            self.worker_count -= 1

    tsp = TSPTestPairedProcess(idem, 1, 1, verbose=False)

    inseqs = [Read(name='a/1', sequence='AAA'),
              Read(name='a/2', sequence='TTT')]
    outfp = StringIO()

    tsp.start(inseqs, outfp)

    x = load_records_d(outfp)
    assert len(x) == 2
    assert x['a/1'] == 'AAA'
    assert x['a/2'] == 'TTT'


def test_paired_2thread_more_seq():
    class TSPTestPairedProcess(ThreadedSequenceProcessor):
        # do_process that ensures paired ends are kept together

        def do_process(self):
            inq = self.inqueue

            while not self.done or not inq.empty():
                try:
                    g = inq.get(True, 1)
                except queue.Empty:
                    continue

                if len(g.seqlist) == 2:
                    first_rec = g.seqlist[0]
                    second_rec = g.seqlist[1]

                    assert first_rec['name'][:-1] == second_rec['name'][:-1]
                    assert first_rec['name'][-1] == '1'
                    assert second_rec['name'][-1] == '2'

                keep = []
                for record in g.seqlist:
                    name, sequence = self.process_fn(record)
                    if name:
                        keep.append((name, sequence, None))

                self.outqueue.put(SequenceGroup(0, keep))

            self.worker_count -= 1

    tsp = TSPTestPairedProcess(idem, 1, 1, verbose=False)

    inseqs = [Read(name='b/1', sequence='AAA'),
              Read(name='a/1', sequence='AAA'),
              Read(name='a/2', sequence='TTT'),
              Read(name='c/2', sequence='AAA')]
    outfp = StringIO()

    tsp.start(inseqs, outfp)

    x = load_records_d(outfp)
    assert len(x) == 4, x
    assert x['a/1'] == 'AAA'
    assert x['a/2'] == 'TTT'
    assert x['b/1'] == 'AAA'
    assert x['c/2'] == 'AAA'

"""Parsing-layer class API (parity: khmer/_oxli/parsing.pyx):
Sequence, FastxParser, SanitizedFastxParser, SplitPairedReader,
BrokenPairedReader, and the pairing check helpers."""

from khmer_tpu.io.fastx import FastxReader, Read
from khmer_tpu.utils import (UnpairedReadsError, broken_paired_reader,
                             check_is_left, check_is_pair, check_is_right)

# parsing.pyx's Sequence mirrors the Read record
Sequence = Read

# the plain parser IS the fastx reader
FastxParser = FastxReader


class SanitizedFastxParser(FastxReader):
    """FastxParser that yields cleaned-sequence records
    (parsing.pyx SanitizedFastxParser: uppercase, non-ACGT -> A)."""

    def __init__(self, filename, convert_n=True):
        super().__init__(filename)
        self.convert_n = convert_n
        self.n_bad = 0

    def __iter__(self):
        for read in super().__iter__():
            read.sequence = read.cleaned_seq
            yield read


class BrokenPairedReader:
    """Iterator of (n, is_pair, read1, read2) over a possibly
    broken-paired stream (parsing.pyx:316-417)."""

    def __init__(self, parser, min_length=None, force_single=False,
                 require_paired=False):
        self.parser = parser
        self.min_length = min_length
        self.force_single = force_single
        self.require_paired = require_paired

    def __iter__(self):
        return broken_paired_reader(
            self.parser, min_length=self.min_length,
            force_single=self.force_single,
            require_paired=self.require_paired)


class SplitPairedReader:
    """Read two mate files in lockstep, yielding
    (n, is_pair, read1, read2) (parsing.pyx SplitPairedReader)."""

    def __init__(self, left_parser, right_parser, min_length=None,
                 force_name_match=False):
        self.left = left_parser
        self.right = right_parser
        self.min_length = min_length
        self.force_name_match = force_name_match

    def __iter__(self):
        from itertools import zip_longest

        n = 0
        for read1, read2 in zip_longest(iter(self.left), iter(self.right)):
            if read1 is None or read2 is None:
                raise UnpairedReadsError(
                    "Differing lengths of left and right files!",
                    read1, read2)
            if self.force_name_match and not check_is_pair(read1, read2):
                raise UnpairedReadsError(
                    "Left and right reads are not paired!", read1, read2)
            if self.min_length is not None:
                if len(read1.sequence) < self.min_length or \
                        len(read2.sequence) < self.min_length:
                    n += 2
                    continue
            yield n, True, read1, read2
            n += 2

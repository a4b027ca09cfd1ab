// Native k-mer seed lookup: encode + probe the sorted unique-kmer table.
//
// The reference's seed detection lives in daligner's C (radix-sorted
// k-mer lists, SURVEY §2.3); the Python/NumPy port of the lookup became
// the host bottleneck of the whole mapping stage (GIL-bound short numpy
// calls).  This translation unit does the per-query work — rolling
// 2-bit k-mer encode, bucket-table probe, occurrence expansion — in one
// pass, called via ctypes (the GIL is released, so the seeding thread
// pool parallelizes for real).
//
// Two-phase protocol: phase 1 (out_offsets == nullptr) fills `counts`
// with seeds per query; the caller prefix-sums into `out_offsets` and
// calls phase 2, which writes (a_pos, b_pos) pairs.
//
// dentist_seed_lookup_stream is the preferred single-pass protocol: it
// emits the (a_pos, b_pos) stream contiguously into a caller-allocated
// buffer of `capacity` entries while counting, and returns the total
// needed.  On the rare overflow (total > capacity) the caller retries
// with an exact-size buffer — one probe pass instead of two in the
// common case, which halves the mapping stage's dominant host cost.

#include <cstdint>

extern "C" {

void dentist_seed_lookup(
    const uint8_t* qcodes, const int64_t* qoffs, int64_t nq,
    int32_t k, int32_t stride, int64_t max_occ,
    const int32_t* unique_kmers, const int64_t* unique_start,
    int64_t n_unique,
    const int64_t* bucket_start, int32_t bucket_bits, int32_t total_bits,
    const int64_t* sorted_pos,
    int64_t* counts,
    const int64_t* out_offsets,
    int64_t* out_apos, int64_t* out_bpos)
{
    const int32_t low_shift = total_bits - bucket_bits;
    constexpr int64_t BLK = 256;  // staged probe: software prefetch per pass
    int32_t vbuf[BLK];
    int64_t ibuf[BLK], lobuf[BLK], hibuf[BLK], ubuf[BLK], sbuf[BLK], obuf[BLK];

    for (int64_t q = 0; q < nq; ++q) {
        const uint8_t* codes = qcodes + qoffs[q];
        const int64_t len = qoffs[q + 1] - qoffs[q];
        int64_t found = 0;
        int64_t* apos = nullptr;
        int64_t* bpos = nullptr;
        if (out_offsets) {
            apos = out_apos + out_offsets[q];
            bpos = out_bpos + out_offsets[q];
        }
        const int64_t nkm = (len >= k) ? (len - k) / stride + 1 : 0;
        for (int64_t blk = 0; blk < nkm; blk += BLK) {
            const int64_t nb = (nkm - blk < BLK) ? (nkm - blk) : BLK;
            // pass 1: encode + prefetch the bucket bounds (the tables are
            // far larger than cache; every pass is latency-bound without
            // the explicit prefetch distance)
            for (int64_t j = 0; j < nb; ++j) {
                const int64_t i = (blk + j) * stride;
                int32_t v = 0;
                for (int32_t t = 0; t < k; ++t)
                    v = (v << 2) | (codes[i + t] & 3);
                vbuf[j] = v;
                ibuf[j] = i;
                if (bucket_start)
                    __builtin_prefetch(&bucket_start[(uint32_t)v >> low_shift]);
            }
            // pass 2: bucket bounds + prefetch the unique-kmer entries
            for (int64_t j = 0; j < nb; ++j) {
                if (bucket_start) {
                    const int64_t b = (uint32_t)vbuf[j] >> low_shift;
                    lobuf[j] = bucket_start[b];
                    hibuf[j] = bucket_start[b + 1];
                    __builtin_prefetch(&unique_kmers[lobuf[j]]);
                } else {
                    lobuf[j] = 0;
                    hibuf[j] = n_unique;
                }
            }
            // pass 3: resolve the unique index + prefetch its occ bounds
            for (int64_t j = 0; j < nb; ++j) {
                int64_t u = -1;
                if (bucket_start) {
                    for (int64_t c = lobuf[j]; c < hibuf[j]; ++c)
                        if (unique_kmers[c] == vbuf[j]) { u = c; break; }
                } else {  // small index: binary search
                    int64_t lo = lobuf[j], hi = hibuf[j];
                    while (lo < hi) {
                        const int64_t mid = (lo + hi) >> 1;
                        if (unique_kmers[mid] < vbuf[j]) lo = mid + 1;
                        else hi = mid;
                    }
                    if (lo < n_unique && unique_kmers[lo] == vbuf[j]) u = lo;
                }
                ubuf[j] = u;
                if (u >= 0)
                    __builtin_prefetch(&unique_start[u]);
            }
            // pass 4: occurrence bounds + prefetch the position run
            for (int64_t j = 0; j < nb; ++j) {
                if (ubuf[j] < 0) { obuf[j] = 0; continue; }
                sbuf[j] = unique_start[ubuf[j]];
                const int64_t occ = unique_start[ubuf[j] + 1] - sbuf[j];
                obuf[j] = (occ > 0 && occ <= max_occ) ? occ : 0;
                if (obuf[j])
                    __builtin_prefetch(&sorted_pos[sbuf[j]]);
            }
            // pass 5: emit
            for (int64_t j = 0; j < nb; ++j) {
                const int64_t occ = obuf[j];
                if (!occ) continue;
                if (out_offsets) {
                    for (int64_t c = 0; c < occ; ++c) {
                        apos[found + c] = sorted_pos[sbuf[j] + c];
                        bpos[found + c] = ibuf[j];
                    }
                }
                found += occ;
            }
        }
        counts[q] = found;
    }
}

int64_t dentist_seed_lookup_stream(
    const uint8_t* qcodes, const int64_t* qoffs, int64_t nq,
    int32_t k, int32_t stride, int64_t max_occ,
    const int32_t* unique_kmers, const int64_t* unique_start,
    int64_t n_unique,
    const int64_t* bucket_start, int32_t bucket_bits, int32_t total_bits,
    const int64_t* sorted_pos,
    int64_t* counts,
    int64_t capacity,
    int64_t* out_apos, int64_t* out_bpos)
{
    const int32_t low_shift = total_bits - bucket_bits;
    constexpr int64_t BLK = 256;
    int32_t vbuf[BLK];
    int64_t ibuf[BLK], lobuf[BLK], hibuf[BLK], ubuf[BLK], sbuf[BLK], obuf[BLK];
    int64_t w = 0;        // contiguous write cursor
    bool overflow = false;

    for (int64_t q = 0; q < nq; ++q) {
        const uint8_t* codes = qcodes + qoffs[q];
        const int64_t len = qoffs[q + 1] - qoffs[q];
        int64_t found = 0;
        const int64_t nkm = (len >= k) ? (len - k) / stride + 1 : 0;
        for (int64_t blk = 0; blk < nkm; blk += BLK) {
            const int64_t nb = (nkm - blk < BLK) ? (nkm - blk) : BLK;
            for (int64_t j = 0; j < nb; ++j) {
                const int64_t i = (blk + j) * stride;
                int32_t v = 0;
                for (int32_t t = 0; t < k; ++t)
                    v = (v << 2) | (codes[i + t] & 3);
                vbuf[j] = v;
                ibuf[j] = i;
                if (bucket_start)
                    __builtin_prefetch(&bucket_start[(uint32_t)v >> low_shift]);
            }
            for (int64_t j = 0; j < nb; ++j) {
                if (bucket_start) {
                    const int64_t b = (uint32_t)vbuf[j] >> low_shift;
                    lobuf[j] = bucket_start[b];
                    hibuf[j] = bucket_start[b + 1];
                    __builtin_prefetch(&unique_kmers[lobuf[j]]);
                } else {
                    lobuf[j] = 0;
                    hibuf[j] = n_unique;
                }
            }
            for (int64_t j = 0; j < nb; ++j) {
                int64_t u = -1;
                if (bucket_start) {
                    for (int64_t c = lobuf[j]; c < hibuf[j]; ++c)
                        if (unique_kmers[c] == vbuf[j]) { u = c; break; }
                } else {
                    int64_t lo = lobuf[j], hi = hibuf[j];
                    while (lo < hi) {
                        const int64_t mid = (lo + hi) >> 1;
                        if (unique_kmers[mid] < vbuf[j]) lo = mid + 1;
                        else hi = mid;
                    }
                    if (lo < n_unique && unique_kmers[lo] == vbuf[j]) u = lo;
                }
                ubuf[j] = u;
                if (u >= 0)
                    __builtin_prefetch(&unique_start[u]);
            }
            for (int64_t j = 0; j < nb; ++j) {
                if (ubuf[j] < 0) { obuf[j] = 0; continue; }
                sbuf[j] = unique_start[ubuf[j]];
                const int64_t occ = unique_start[ubuf[j] + 1] - sbuf[j];
                obuf[j] = (occ > 0 && occ <= max_occ) ? occ : 0;
                if (obuf[j])
                    __builtin_prefetch(&sorted_pos[sbuf[j]]);
            }
            for (int64_t j = 0; j < nb; ++j) {
                const int64_t occ = obuf[j];
                if (!occ) continue;
                if (!overflow && w + occ <= capacity) {
                    for (int64_t c = 0; c < occ; ++c) {
                        out_apos[w + c] = sorted_pos[sbuf[j] + c];
                        out_bpos[w + c] = ibuf[j];
                    }
                    w += occ;
                } else {
                    overflow = true;  // keep counting; caller retries exact
                }
                found += occ;
            }
        }
        counts[q] = found;
    }
    int64_t total = 0;
    for (int64_t q = 0; q < nq; ++q) total += counts[q];
    return total;
}

// Greedy diagonal-continuity merge of band-local seed sub-clusters
// (pass 2 of the clustering in ops/seeding.py — daligner's diagonal-band
// merge).  The Python loop ran once per sub-cluster (~millions at genome
// scale) holding the GIL, which serialized the seeding thread pool; the
// exact same greedy (8-entry lookback, identical comparisons incl. the
// float slope bound) runs here in native code.
//
// cols: M x 6 rows (g, seq, a0, a1, b0, b1) sorted by (g, seq, a0, b0).
// Outputs: assign[M] = merged-cluster id per row (ids in creation
// order), bounds[K x 6] = final (g, seq, a0, a1, b0, b1) per cluster.
// Returns K.
int64_t dentist_seed_merge(
    const int64_t* cols, int64_t M,
    int64_t max_gap, int64_t slope_slack, double slope_frac,
    int64_t* assign, int64_t* bounds)
{
    int64_t K = 0;
    for (int64_t r = 0; r < M; ++r) {
        const int64_t g = cols[r * 6 + 0], sq = cols[r * 6 + 1];
        const int64_t a0 = cols[r * 6 + 2], a1 = cols[r * 6 + 3];
        const int64_t b0 = cols[r * 6 + 4], b1 = cols[r * 6 + 5];
        bool attached = false;
        const int64_t lo = (K >= 8) ? K - 8 : 0;
        for (int64_t m = K - 1; m >= lo; --m) {
            int64_t* mb = bounds + m * 6;
            if (mb[0] != g || mb[1] != sq)
                continue;
            const int64_t gap_a = a0 - mb[3];
            const int64_t gap_b = b0 - mb[5];
            if (gap_a > max_gap)
                continue;
            const int64_t aga = gap_a < 0 ? -gap_a : gap_a;
            const int64_t agb = gap_b < 0 ? -gap_b : gap_b;
            const int64_t mx = aga > agb ? aga : agb;
            const int64_t d = gap_a - gap_b;
            const int64_t ad = d < 0 ? -d : d;
            if ((double)ad <= (double)slope_slack + slope_frac * (double)mx) {
                if (a1 > mb[3]) mb[3] = a1;
                if (b1 > mb[5]) mb[5] = b1;
                assign[r] = m;
                attached = true;
                break;
            }
        }
        if (!attached) {
            int64_t* mb = bounds + K * 6;
            mb[0] = g; mb[1] = sq; mb[2] = a0; mb[3] = a1;
            mb[4] = b0; mb[5] = b1;
            assign[r] = K;
            ++K;
        }
    }
    return K;
}

}  // extern "C"

"""Densified representation of the sparse lookup polynomial
(reference: src/lasso/densified.rs).

The reference builds read/final timestamp counters with a sequential O(C*s)
scan.  Here the counters are computed with a TPU-native sort + segmented-rank
formulation (read_ts[j] = number of prior ops touching the same address):

  order      = stable argsort of addresses
  run starts = positions where the sorted address changes
  rank       = index - cummax(run-start index)     (occurrence number)
  read_ts    = rank scattered back through `order`
  final_ts   = (last rank + 1) scattered to the address

which is O(C * s log s) of fully parallel work instead of a serial loop.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lasso_tpu.field.jfield import JFr
from lasso_tpu.poly.dense import DensePolynomial
from lasso_tpu.poly.hyrax import PolyCommitment, commit_poly
from lasso_tpu.utils.tracing import instrument


@functools.partial(jax.jit, static_argnames=("m",))
def _timestamps(addrs, m: int):
    """addrs: [s] int32. Returns (read_ts [s], final_ts [m]) as int32."""
    s = addrs.shape[0]
    order = jnp.argsort(addrs, stable=True)
    sorted_addrs = addrs[order]
    idx = jnp.arange(s, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_addrs[1:] != sorted_addrs[:-1]])
    start_idx = jax.lax.cummax(jnp.where(is_start, idx, 0))
    rank = idx - start_idx
    read_ts = jnp.zeros((s,), jnp.int32).at[order].set(rank)

    is_end = jnp.concatenate(
        [sorted_addrs[1:] != sorted_addrs[:-1], jnp.ones((1,), jnp.bool_)])
    # scatter (last rank + 1) to each address; untouched addresses stay 0
    final_ts = jnp.zeros((m,), jnp.int32).at[
        jnp.where(is_end, sorted_addrs, m)].set(
        jnp.where(is_end, rank + 1, 0), mode="drop")
    return read_ts, final_ts


@dataclass
class SparsePolynomialCommitment:
    l_variate_polys_commitment: PolyCommitment
    log_m_variate_polys_commitment: PolyCommitment
    s: int
    log_m: int
    m: int

    def append_to_transcript(self, label: bytes, transcript) -> None:
        self.l_variate_polys_commitment.append_to_transcript(
            b"l_variate_polys_commitment", transcript)
        self.log_m_variate_polys_commitment.append_to_transcript(
            b"log_m_variate_polys_commitment", transcript)
        transcript.append_u64(b"s", self.s)
        transcript.append_u64(b"log_m", self.log_m)
        transcript.append_u64(b"m", self.m)


class DensifiedRepresentation:
    """dim/read/final counter polynomials + merged commitments."""

    @instrument("Densify")
    def __init__(self, indices, log_m: int, c: int):
        """indices: [s_raw][C] lookup indices (host ints or numpy)."""
        arr = np.asarray(indices, dtype=np.int64)
        assert arr.ndim == 2 and arr.shape[1] == c
        s_raw = arr.shape[0]
        s = 1 << max((s_raw - 1).bit_length(), 0)
        m = 1 << log_m
        assert int(arr.max(initial=0)) < m

        # pad with address-0 accesses, as the reference does (densified.rs:37)
        padded = np.zeros((s, c), dtype=np.int32)
        padded[:s_raw] = arr
        self.c = c
        self.s = s
        self.log_m = log_m
        self.m = m

        self.dim_usize = jnp.asarray(padded.T)  # [C, s] int32 (device)
        read_list, final_list = [], []
        for i in range(c):
            read_ts, final_ts = _timestamps(self.dim_usize[i], m)
            read_list.append(np.asarray(read_ts).astype(np.uint64))
            final_list.append(np.asarray(final_ts).astype(np.uint64))

        # ONE encode per merged polynomial: the combined arrays are the only
        # resident copies; the per-dimension dim/read/final polys are lazy
        # slice views (see the properties below).  The previous layout kept
        # the 2C+C individual polys AND their merged copies alive for the
        # whole prove -- double the HBM of the largest tensors in the proof.
        def _merged_flat(rows_u64: list[np.ndarray]) -> np.ndarray:
            total = sum(len(r) for r in rows_u64)
            pow2 = 1 << (total - 1).bit_length()
            flat = np.zeros(pow2, dtype=np.uint64)
            off = 0
            for r in rows_u64:
                flat[off: off + len(r)] = r
                off += len(r)
            return flat

        dim_u64 = [padded[:, i].astype(np.uint64) for i in range(c)]
        self.combined_l_variate_polys = DensePolynomial(
            JFr.encode_u64_array(_merged_flat(dim_u64 + read_list)))
        self.combined_log_m_variate_polys = DensePolynomial(
            JFr.encode_u64_array(_merged_flat(final_list)))

    # -- lazy per-dimension views (materialized slices; do not hold) ----------
    @property
    def dim(self) -> list[DensePolynomial]:
        z = self.combined_l_variate_polys.z
        return [DensePolynomial(z[i * self.s: (i + 1) * self.s])
                for i in range(self.c)]

    @property
    def read(self) -> list[DensePolynomial]:
        z = self.combined_l_variate_polys.z
        return [DensePolynomial(z[(self.c + i) * self.s: (self.c + i + 1) * self.s])
                for i in range(self.c)]

    @property
    def final(self) -> list[DensePolynomial]:
        z = self.combined_log_m_variate_polys.z
        return [DensePolynomial(z[i * self.m: (i + 1) * self.m])
                for i in range(self.c)]

    @instrument("DensifiedRepresentation.commit")
    def commit(self, gens) -> SparsePolynomialCommitment:
        l_comm, _ = commit_poly(
            self.combined_l_variate_polys, gens.gens_combined_l_variate)
        m_comm, _ = commit_poly(
            self.combined_log_m_variate_polys, gens.gens_combined_log_m_variate)
        return SparsePolynomialCommitment(
            l_variate_polys_commitment=l_comm,
            log_m_variate_polys_commitment=m_comm,
            s=self.s, log_m=self.log_m, m=self.m)

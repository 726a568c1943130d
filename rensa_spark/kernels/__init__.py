"""Bit-exact numpy kernels for rensa's hashing/sketching math.

Each module reimplements a reference algorithm (cited per-function) as
vectorized numpy over Arrow-batch-shaped inputs. All arithmetic is unsigned
64/32-bit with explicit wrap-around to match Rust wrapping_{mul,add}.
"""

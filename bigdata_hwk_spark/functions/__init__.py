from .hashing import md5_hash64, md5_hash64_sql

__all__ = ["md5_hash64", "md5_hash64_sql"]

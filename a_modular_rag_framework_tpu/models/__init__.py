from .hash_embed import HashEmbedEncoder, hash_embed_numpy

__all__ = ["HashEmbedEncoder", "hash_embed_numpy"]

from .hashing import row_fingerprint, norm_text_hash  # noqa: F401
from .scalars import amount_usd  # noqa: F401

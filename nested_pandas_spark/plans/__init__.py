from .lazy_pack import PendingPack

"""TEST STUB: scenario proto placeholder (the pool only round-trips bytes)."""


class Scenario:
    def __init__(self, raw=b""):
        self.raw = raw

    @classmethod
    def FromString(cls, data: bytes):
        return cls(data)

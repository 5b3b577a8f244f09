"""Training-dataset serving: iterator with shuffle/batch/repeat, and the
train/test split protocol.

Mirrors the reference's client dataset wrappers
(client/src/featureform/serving.py:310-436 — gRPC row stream + shuffle
buffer, epoch repeat, fixed-size batches) on top of
``DataFrame.toLocalIterator`` so only one partition is resident in the
driver at a time. The shuffle is the same bounded buffer-shuffle the
reference uses (seeded, reservoir-style) — a full ``orderBy(rand())``
would be a pointless global sort at serving time.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

from pyspark.sql import DataFrame, Row

from featureform_spark.operators.split import train_test_split


class Dataset:
    """Iterable over training-set rows with composable wrappers."""

    def __init__(self, df: DataFrame):
        self._df = df

    def dataframe(self) -> DataFrame:
        return self._df

    def __iter__(self) -> Iterator[Row]:
        return iter(self._df.toLocalIterator())

    # -- wrappers (compose like the reference's Dataset) --------------------

    def shuffle(self, buffer_size: int = 10_000, seed: int = 42) -> "ShuffledDataset":
        return ShuffledDataset(self, buffer_size, seed)

    def repeat(self, epochs: int) -> "RepeatedDataset":
        return RepeatedDataset(self, epochs)

    def batch(self, size: int) -> "BatchedDataset":
        return BatchedDataset(self, size)

    def split(
        self, key_cols: list[str], test_fraction: float = 0.2, seed: int = 42
    ) -> tuple["Dataset", "Dataset"]:
        train, test = train_test_split(self._df, key_cols, test_fraction, seed)
        return Dataset(train), Dataset(test)

    def pandas(self, limit: int | None = None):
        """V6: preview to pandas (limited)."""
        df = self._df.limit(limit) if limit else self._df
        return df.toPandas()


class ShuffledDataset(Dataset):
    """Bounded buffer shuffle (reference serving.py:379-412)."""

    def __init__(self, inner: Dataset, buffer_size: int, seed: int):
        super().__init__(inner._df)
        self._inner = inner
        self._buffer_size = max(1, buffer_size)
        self._seed = seed

    def __iter__(self) -> Iterator[Row]:
        rng = random.Random(self._seed)
        buf: list[Row] = []
        for row in self._inner:
            buf.append(row)
            if len(buf) >= self._buffer_size:
                i = rng.randrange(len(buf))
                buf[i], buf[-1] = buf[-1], buf[i]
                yield buf.pop()
        rng.shuffle(buf)
        yield from buf


class RepeatedDataset(Dataset):
    def __init__(self, inner: Dataset, epochs: int):
        super().__init__(inner._df)
        self._inner = inner
        self._epochs = epochs

    def __iter__(self) -> Iterator[Row]:
        for _ in range(self._epochs):
            yield from self._inner


class BatchedDataset(Dataset):
    def __init__(self, inner: Dataset, size: int):
        super().__init__(inner._df)
        self._inner = inner
        self._size = max(1, size)

    def __iter__(self):
        batch: list[Row] = []
        for row in self._inner:
            batch.append(row)
            if len(batch) == self._size:
                yield batch
                batch = []
        if batch:
            yield batch

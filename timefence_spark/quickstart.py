"""Quickstart project generator: deterministic synthetic data + a demo
project layout, including a pre-built LEAKY training set for audit to catch.

Mirrors the reference quickstart flow (quickstart.py:41-206): users with
multiple snapshots (so as-of joins pick among candidates), transactions,
labels, and a ``train_LEAKY.parquet`` whose features were joined with
*future* data (<= label_time + 14d), which the audit must flag.

Data generation is pure python/pyarrow (deterministic arithmetic, no
randomness) — no Spark session needed to scaffold a project.
"""

from __future__ import annotations

import datetime as dt
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

N_USERS = 2000
SNAPSHOT_DATES = [
    dt.datetime(2023, 1, 15),
    dt.datetime(2023, 7, 15),
    dt.datetime(2024, 1, 15),
]
COUNTRIES = ["US", "UK", "DE", "FR", "JP"]
TIERS = ["free", "pro", "enterprise"]

FEATURES_TEMPLATE = '''\
"""Feature definitions for the quickstart project."""

import timefence_spark as tf

users = tf.Source("users.parquet", keys="user_id", timestamp="updated_at")
transactions = tf.Source(
    "transactions.parquet", keys="user_id", timestamp="created_at"
)

user_country = tf.Feature(users, columns="country", name="user_country",
                          on_duplicate="keep_any")

user_tier = tf.Feature(users, columns="tier", name="user_tier",
                       on_duplicate="keep_any")

rolling_spend_30d = tf.Feature(
    transactions,
    sql="""
        SELECT user_id, created_at AS feature_time,
               SUM(amount) OVER (
                   PARTITION BY user_id ORDER BY created_at
                   RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
               ) AS spend_30d
        FROM {source}
    """,
    name="rolling_spend_30d",
    embargo="1d",
    on_duplicate="keep_any",
)
'''

CONFIG_TEMPLATE = """\
labels:
  path: labels.parquet
  keys: [user_id]
  label_time: label_time
  target: [churned]

features: features.py

defaults:
  max_lookback: 365d
  join: strict

output: train.parquet
store: .timefence_spark
"""


def _ts_array(values: list[dt.datetime]) -> pa.Array:
    return pa.array(values, type=pa.timestamp("us"))


def _write(path: Path, table: pa.Table) -> None:
    pq.write_table(table, path)


def generate_users(path: Path) -> None:
    uid, country, signup, updated, tier = [], [], [], [], []
    for i in range(1, N_USERS + 1):
        for snap in SNAPSHOT_DATES:
            uid.append(i)
            country.append(COUNTRIES[i % 5])
            signup.append((dt.datetime(2020, 1, 1) + dt.timedelta(days=i % 1000)).date())
            updated.append(snap)
            tier.append(TIERS[i % 3])
    _write(
        path,
        pa.table(
            {
                "user_id": pa.array(uid, pa.int32()),
                "country": country,
                "signup_date": pa.array(signup, pa.date32()),
                "updated_at": _ts_array(updated),
                "tier": tier,
            }
        ),
    )


def generate_transactions(path: Path, per_user: int = 20) -> None:
    uid, created, amount = [], [], []
    n = N_USERS * per_user
    for i in range(1, n + 1):
        uid.append(((i - 1) % N_USERS) + 1)
        created.append(
            dt.datetime(2022, 1, 1)
            + dt.timedelta(days=(i * 7) % 1095, hours=(i * 13) % 24)
        )
        amount.append(round((50 + (i * 17) % 500) / 10.0, 2))
    _write(
        path,
        pa.table(
            {
                "user_id": pa.array(uid, pa.int32()),
                "created_at": _ts_array(created),
                "amount": pa.array(amount, pa.float64()),
            }
        ),
    )


def generate_labels(path: Path, n: int = 1000) -> None:
    uid, lt, churned = [], [], []
    for i in range(1, n + 1):
        uid.append(((i - 1) % N_USERS) + 1)
        lt.append(dt.datetime(2023, 6, 1) + dt.timedelta(days=(i * 11) % 548))
        churned.append(i % 5 == 0)
    _write(
        path,
        pa.table(
            {
                "user_id": pa.array(uid, pa.int32()),
                "label_time": _ts_array(lt),
                "churned": pa.array(churned, pa.bool_()),
            }
        ),
    )


def generate_leaky_training_set(dir_path: Path) -> None:
    """Join features with data up to label_time + 14 days — planted leakage
    the audit must detect (reference quickstart.py:119-206)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW users AS SELECT * FROM read_parquet('{dir_path / 'users.parquet'}')"
    )
    con.execute(
        "CREATE VIEW transactions AS "
        f"SELECT * FROM read_parquet('{dir_path / 'transactions.parquet'}')"
    )
    con.execute(
        f"CREATE VIEW labels AS SELECT * FROM read_parquet('{dir_path / 'labels.parquet'}')"
    )
    con.execute(
        f"""
        COPY (
            WITH l AS (SELECT ROW_NUMBER() OVER () AS rid, * FROM labels),
            snap AS (
                SELECT l.rid, u.country, u.updated_at
                FROM l JOIN users u ON u.user_id = l.user_id
                 AND u.updated_at <= l.label_time + INTERVAL 14 DAY
                QUALIFY ROW_NUMBER() OVER (
                    PARTITION BY l.rid ORDER BY u.updated_at DESC) = 1
            ),
            spend AS (
                SELECT l.rid,
                       SUM(t.amount) AS spend_30d,
                       MAX(t.created_at) AS last_txn
                FROM l JOIN transactions t ON t.user_id = l.user_id
                 AND t.created_at <= l.label_time + INTERVAL 2 DAY
                 AND t.created_at >= l.label_time - INTERVAL 28 DAY
                GROUP BY l.rid
            )
            SELECT l.user_id, l.label_time, l.churned,
                   snap.country AS user_country__country,
                   snap.updated_at AS user_country__feature_time,
                   spend.spend_30d AS rolling_spend_30d__spend_30d,
                   spend.last_txn AS rolling_spend_30d__feature_time
            FROM l
            LEFT JOIN snap ON snap.rid = l.rid
            LEFT JOIN spend ON spend.rid = l.rid
            ORDER BY l.user_id, l.label_time
        ) TO '{dir_path / "train_LEAKY.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()


def create_quickstart(target: Path) -> Path:
    target = Path(target)
    target.mkdir(parents=True, exist_ok=True)
    generate_users(target / "users.parquet")
    generate_transactions(target / "transactions.parquet")
    generate_labels(target / "labels.parquet")
    generate_leaky_training_set(target)
    (target / "features.py").write_text(FEATURES_TEMPLATE)
    (target / "timefence.yaml").write_text(CONFIG_TEMPLATE)
    return target

"""Two-round three-party Diffie-Hellman on G1 — the reference's
examples/dh.rs, batched."""

from bn_tpu import Fr, G1


def main(batch: int = 4, seed: int = 11):
    alice_sk = Fr.random(seed, batch)
    bob_sk = Fr.random(seed + 1, batch)
    carol_sk = Fr.random(seed + 2, batch)

    alice_pk = G1.one(batch) * alice_sk
    bob_pk = G1.one(batch) * bob_sk
    carol_pk = G1.one(batch) * carol_sk

    # Round one
    alice_dh_1 = bob_pk * carol_sk
    bob_dh_1 = carol_pk * alice_sk
    carol_dh_1 = alice_pk * bob_sk

    # Round two
    alice_dh_2 = alice_dh_1 * alice_sk
    bob_dh_2 = bob_dh_1 * bob_sk
    carol_dh_2 = carol_dh_1 * carol_sk

    assert alice_dh_2 == bob_dh_2 and bob_dh_2 == carol_dh_2
    return alice_dh_2


if __name__ == "__main__":
    main()
    print("dh: shared secrets agree")

"""One-round tripartite (Joux) key agreement — the reference's
examples/joux.rs, batched: every lane of the batch is an independent
three-party exchange."""

from bn_tpu import Fr, G1, G2, pairing


def main(batch: int = 4, seed: int = 1):
    alice_sk = Fr.random(seed, batch)
    bob_sk = Fr.random(seed + 1, batch)
    carol_sk = Fr.random(seed + 2, batch)

    alice_pk1, alice_pk2 = G1.one(batch) * alice_sk, G2.one(batch) * alice_sk
    bob_pk1, bob_pk2 = G1.one(batch) * bob_sk, G2.one(batch) * bob_sk
    carol_pk1, carol_pk2 = G1.one(batch) * carol_sk, G2.one(batch) * carol_sk

    alice_ss = pairing(bob_pk1, carol_pk2).pow(alice_sk)
    bob_ss = pairing(carol_pk1, alice_pk2).pow(bob_sk)
    carol_ss = pairing(alice_pk1, bob_pk2).pow(carol_sk)

    assert alice_ss == bob_ss and bob_ss == carol_ss
    return alice_ss


if __name__ == "__main__":
    main()
    print("joux: shared secrets agree")

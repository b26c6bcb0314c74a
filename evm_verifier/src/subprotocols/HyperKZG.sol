// SPDX-License-Identifier: MIT
pragma solidity >=0.8.21;

import {Fr, FrLib, FR_MODULUS} from "./Fr.sol";
import {Transcript, FiatShamirTranscript} from "./FiatShamirTranscript.sol";

/// HyperKZG opening verification over the BN254 pairing precompiles,
/// mirroring jolt_tpu/commitment/hyperkzg.py verify / _kzg_verify_batch
/// (reference hyperkzg.rs:365-470, 201-281): fold-consistency checks on the
/// claimed evaluations at {r, -r, r^2}, then one MSM + one multi-pairing.
library HyperKZG {
    using FiatShamirTranscript for Transcript;

    struct G1Point {
        uint256 x;
        uint256 y;
    }

    struct G2Point {
        uint256[2] x; // x = x0 + x1*u, encoded [x1, x0] for the precompile
        uint256[2] y;
    }

    struct VerifierKey {
        G1Point g1;
        G2Point g2;
        G2Point betaG2; // g2 * tau
    }

    struct HyperKZGProof {
        G1Point[] com;   // commitments to the ell-1 folded polynomials
        G1Point[3] w;    // KZG witnesses at r, -r, r^2
        Fr[] v;          // 3*ell claimed evaluations, rows [pos, neg, sq]
    }

    // -- BN254 precompiles ---------------------------------------------------

    function ecAdd(G1Point memory a, G1Point memory b) internal view returns (G1Point memory out) {
        (bool ok, bytes memory res) = address(0x06).staticcall(
            abi.encode(a.x, a.y, b.x, b.y));
        require(ok, "ecAdd failed");
        (out.x, out.y) = abi.decode(res, (uint256, uint256));
    }

    function ecMul(G1Point memory p, uint256 s) internal view returns (G1Point memory out) {
        (bool ok, bytes memory res) = address(0x07).staticcall(
            abi.encode(p.x, p.y, s));
        require(ok, "ecMul failed");
        (out.x, out.y) = abi.decode(res, (uint256, uint256));
    }

    function negate(G1Point memory p) internal pure returns (G1Point memory) {
        if (p.x == 0 && p.y == 0) return p;
        uint256 q = 21888242871839275222246405745257275088696311157297823662689037894645226208583;
        return G1Point(p.x, q - (p.y % q));
    }

    /// e(a1, a2) * e(b1, b2) == 1
    function pairingProductIsOne(
        G1Point memory a1, G2Point memory a2,
        G1Point memory b1, G2Point memory b2
    ) internal view returns (bool) {
        uint256[12] memory input = [
            a1.x, a1.y, a2.x[0], a2.x[1], a2.y[0], a2.y[1],
            b1.x, b1.y, b2.x[0], b2.x[1], b2.y[0], b2.y[1]
        ];
        (bool ok, bytes memory res) = address(0x08).staticcall(abi.encode(input));
        require(ok, "pairing failed");
        return abi.decode(res, (uint256)) == 1;
    }

    // -- verification ----------------------------------------------------------

    function verify(
        HyperKZGProof memory proof,
        VerifierKey memory vk,
        Transcript memory t,
        Fr[] memory point,
        Fr opening,
        G1Point memory commitment
    ) internal view {
        uint256 ell = point.length;
        require(proof.com.length == ell - 1, "com count");
        require(proof.v.length == 3 * ell, "eval count");

        // transcript: folded commitments, then the evaluation challenge r
        uint256[] memory xy = new uint256[](2 * proof.com.length);
        for (uint256 i = 0; i < proof.com.length; i++) {
            xy[2 * i] = proof.com[i].x;
            xy[2 * i + 1] = proof.com[i].y;
        }
        t.appendPoints(xy);
        Fr r = t.challengeScalar();
        require(Fr.unwrap(r) != 0, "zero challenge");

        // fold-consistency: 2*r*Y[i+1] == r*(1-x)*(pos+neg) + x*(pos-neg)
        Fr one = FrLib.from(1);
        Fr two = FrLib.from(2);
        // rows are [pos(ell), neg(ell), sq(ell)]; Y = sq[1:] || opening
        for (uint256 i = 0; i < ell; i++) {
            Fr x = point[ell - i - 1];
            Fr ypos = proof.v[i];
            Fr yneg = proof.v[ell + i];
            Fr ynext = i + 1 < ell ? proof.v[2 * ell + i + 1] : opening;
            Fr lhs = two * r * ynext;
            Fr rhs = r * (one - x) * (ypos + yneg) + x * (ypos - yneg);
            require(lhs == rhs, "fold consistency");
        }

        _verifyBatch(proof, vk, t, r, commitment);
    }

    function _verifyBatch(
        HyperKZGProof memory proof,
        VerifierKey memory vk,
        Transcript memory t,
        Fr r,
        G1Point memory commitment
    ) private view {
        uint256 k = proof.com.length + 1;

        // transcript: all evaluations, q powers, witnesses, d0
        uint256[] memory vs = new uint256[](proof.v.length);
        for (uint256 i = 0; i < proof.v.length; i++) {
            vs[i] = Fr.unwrap(proof.v[i]);
        }
        t.appendVector(vs);
        Fr[] memory qPowers = t.challengeScalarPowers(k);
        uint256[] memory wxy = new uint256[](6);
        for (uint256 i = 0; i < 3; i++) {
            wxy[2 * i] = proof.w[i].x;
            wxy[2 * i + 1] = proof.w[i].y;
        }
        t.appendPoints(wxy);
        Fr d0 = t.challengeScalar();
        Fr d1 = d0 * d0;
        Fr qMult = FrLib.from(1) + d0 + d1;

        // B_u[j] = sum_i v[j][i] * q^i
        uint256 ell = proof.v.length / 3;
        Fr[3] memory bu;
        for (uint256 j = 0; j < 3; j++) {
            Fr acc = FrLib.from(0);
            for (uint256 i = 0; i < ell; i++) {
                acc = acc + proof.v[j * ell + i] * qPowers[i];  // k == ell
            }
            bu[j] = acc;
        }

        // L = sum_i q^i*qMult*C_i + u0*W0 + u1*d0*W1 + u2*d1*W2 - (...)*g1
        Fr u0 = r;
        Fr u1 = FrLib.from(FR_MODULUS - Fr.unwrap(r) % FR_MODULUS);
        Fr u2 = r * r;
        G1Point memory L = ecMul(commitment, Fr.unwrap(qPowers[0] * qMult));
        for (uint256 i = 0; i < proof.com.length; i++) {
            L = ecAdd(L, ecMul(proof.com[i], Fr.unwrap(qPowers[i + 1] * qMult)));
        }
        L = ecAdd(L, ecMul(proof.w[0], Fr.unwrap(u0)));
        L = ecAdd(L, ecMul(proof.w[1], Fr.unwrap(u1 * d0)));
        L = ecAdd(L, ecMul(proof.w[2], Fr.unwrap(u2 * d1)));
        Fr gScalar = FrLib.from(0) - (bu[0] + d0 * bu[1] + d1 * bu[2]);
        L = ecAdd(L, ecMul(vk.g1, Fr.unwrap(gScalar)));

        // R = W0 + d0*W1 + d1*W2 ; check e(L, g2) * e(-R, beta*g2) == 1
        G1Point memory R = ecAdd(
            ecAdd(proof.w[0], ecMul(proof.w[1], Fr.unwrap(d0))),
            ecMul(proof.w[2], Fr.unwrap(d1)));
        require(pairingProductIsOne(L, vk.g2, negate(R), vk.betaG2),
                "pairing check failed");
    }
}

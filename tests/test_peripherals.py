"""System-bus machine model: CLINT/PLIC/UART/VirtIO + SV32/SV39 MMU.

Reference behavior: tracer/src/emulator/{mmu.rs, device/*.rs}.  All
host-side (no JAX) — exercises the full peripheral interrupt path
(device -> PLIC -> mip.SEIP), VirtIO descriptor-chain DMA, and the
page-table walk with A/D write-back and fault cases.
"""
import pytest

from jolt_tpu.tracer.bus import (DRAM_BASE, MACHINE, PAGE_SIZE, SUPERVISOR,
                                 PageFault, SystemBus)
from jolt_tpu.tracer.peripherals import (MIP_MSIP, MIP_MTIP, MIP_SEIP,
                                         UART_IRQ, VIRTIO_IRQ, Clint, Plic,
                                         Terminal, Uart, VirtioBlockDisk,
                                         _UART_INPUT_PERIOD)


# ---------------------------------------------------------------------------
# CLINT
# ---------------------------------------------------------------------------

def test_clint_timer_and_software_interrupt():
    bus = SystemBus()
    # mtimecmp = 5 via byte-lane MMIO stores (clint.rs byte windows)
    bus.store_phys(Clint.BASE + 0x4000, 5, 8)
    for _ in range(4):
        bus.tick()
    assert not bus.mip & MIP_MTIP
    bus.tick()
    assert bus.mip & MIP_MTIP
    assert bus.load_phys(Clint.BASE + 0xBFF8, 8) == 5  # mtime readback

    # msip write raises MSIP; upper bits hardwired zero
    bus.store_phys(Clint.BASE, 0xFF, 4)
    assert bus.load_phys(Clint.BASE, 4) == 1
    bus.tick()
    assert bus.mip & MIP_MSIP


# ---------------------------------------------------------------------------
# UART + PLIC
# ---------------------------------------------------------------------------

def test_uart_tx_reaches_terminal_and_interrupts_via_plic():
    bus = SystemBus()
    # enable UART irq in the PLIC: priority > threshold, enable bit
    bus.store_phys(Plic.BASE + 4 * UART_IRQ, 7, 4)
    bus.store_phys(Plic.BASE + 0x2080, 1 << UART_IRQ, 4)
    bus.store_phys(Plic.BASE + 0x201000, 0, 4)
    # THRE interrupt enable, then transmit one byte
    bus.store_phys(Uart.BASE + 1, 0x2, 1)
    bus.store_phys(Uart.BASE, ord("J"), 1)
    for _ in range(0x11):  # output drains every 0x10 cycles
        bus.tick()
    assert bytes(bus.uart.terminal.output) == b"J"
    bus.tick()
    assert bus.mip & MIP_SEIP
    # claim returns the UART source; complete clears it
    assert bus.load_phys(Plic.BASE + 0x201004, 4) == UART_IRQ
    bus.store_phys(Plic.BASE + 0x201004, UART_IRQ, 1)
    bus.tick()
    assert bus.plic.irq == 0


def test_uart_rx_read_clears_data_ready():
    term = Terminal()
    term.input_queue.extend(b"hi")
    bus = SystemBus(terminal=term)
    bus.uart.clock = _UART_INPUT_PERIOD - 1  # skip to the next input poll
    bus.tick()
    assert bus.uart.lsr & 0x1
    assert bus.load_phys(Uart.BASE, 1) == ord("h")
    assert not bus.uart.lsr & 0x1  # RBR read clears DATA_AVAILABLE


def test_plic_threshold_masks_low_priority():
    plic = Plic()
    plic.priorities[VIRTIO_IRQ] = 1
    plic.enabled = 1 << VIRTIO_IRQ
    plic.threshold = 3
    mip = plic.tick(True, False, 0)
    assert not mip & MIP_SEIP and plic.irq == 0
    plic.threshold = 0
    plic._needs_update = True
    mip = plic.tick(True, False, 0)
    assert mip & MIP_SEIP and plic.irq == VIRTIO_IRQ


# ---------------------------------------------------------------------------
# VirtIO block disk: descriptor-chain DMA through the bus
# ---------------------------------------------------------------------------

def _virtio_request(bus, sector: int, data_addr: int, length: int,
                    write_to_memory: bool):
    """Lay out one legacy virtqueue (descriptors, avail, used) in DRAM and
    notify queue 0 (virtio_block_disk.rs descriptor walk)."""
    page = 0x80100000
    bus.store_phys(VirtioBlockDisk.BASE + 0x28, PAGE_SIZE, 4)  # page size
    bus.store_phys(VirtioBlockDisk.BASE + 0x38, 4, 4)          # queue size
    bus.store_phys(VirtioBlockDisk.BASE + 0x3C, PAGE_SIZE, 4)  # align
    bus.store_phys(VirtioBlockDisk.BASE + 0x40, page // PAGE_SIZE, 4)

    head_addr = page + 0x200                    # virtio_blk_req header
    bus.store_phys(head_addr + 8, sector, 8)
    status_addr = page + 0x300
    descs = ((head_addr, 16, 0x1, 1),           # NEXT
             (data_addr, length, (0x2 if write_to_memory else 0) | 0x1, 2),
             (status_addr, 1, 0x2, 0))          # WRITE status
    for i, (addr, dlen, flags, nxt) in enumerate(descs):
        d = page + 16 * i
        bus.store_phys(d, addr, 8)
        bus.store_phys(d + 8, dlen, 4)
        bus.store_phys(d + 12, flags, 2)
        bus.store_phys(d + 14, nxt, 2)
    avail = page + 4 * 16
    used_idx_before = bus.disk.used_ring_index
    bus.store_phys(avail + 4 + (used_idx_before % 4) * 2, 0, 2)  # head = desc 0
    bus.store_phys(VirtioBlockDisk.BASE + 0x50, 0, 4)            # notify
    for _ in range(502):                        # modeled 500-cycle latency
        bus.tick()
    assert bus.load_phys(status_addr, 1) == 0   # success status byte
    return used_idx_before


def test_virtio_disk_read_and_write_roundtrip():
    bus = SystemBus()
    bus.disk.init(bytes(range(256)) * 8)        # 4 sectors
    data = 0x80200000

    _virtio_request(bus, sector=1, data_addr=data, length=16,
                    write_to_memory=True)       # disk -> memory
    assert bus.load_phys(data, 8) == int.from_bytes(bytes(range(0, 8)),
                                                    "little")
    assert bus.mip & MIP_SEIP == 0              # irq not enabled in PLIC
    assert bus.disk.is_interrupting()
    assert bus.disk.used_ring_index == 1
    bus.store_phys(VirtioBlockDisk.BASE + 0x64, 1, 4)  # ack
    assert not bus.disk.is_interrupting()

    bus.store_phys(data, 0xDEADBEEF, 4)         # memory -> disk
    _virtio_request(bus, sector=1, data_addr=data, length=4,
                    write_to_memory=False)
    assert bus.disk.contents[512:516] == (0xDEADBEEF).to_bytes(4, "little")


# ---------------------------------------------------------------------------
# MMU: SV32 / SV39 walks
# ---------------------------------------------------------------------------

def _write_pte(bus, table: int, index: int, ppn: int, flags: int,
               pte_size: int = 4):
    bus.store_phys(table + index * pte_size, (ppn << 10) | flags, pte_size)


def test_sv32_two_level_walk_sets_ad_bits():
    bus = SystemBus()
    root = DRAM_BASE + 0x4000
    leaf_table = DRAM_BASE + 0x5000
    frame = DRAM_BASE + 0x6000
    va = 0x0040_2000  # vpn1=1, vpn0=2
    _write_pte(bus, root, 1, (leaf_table - 0) >> 12, 0x1)        # pointer
    _write_pte(bus, leaf_table, 2, frame >> 12, 0x7)             # V|R|W leaf
    bus.update_addressing_mode("sv32")
    bus.update_ppn(root >> 12)
    bus.update_privilege_mode(SUPERVISOR)

    bus.store_phys(frame + 0x34, 0xCAFE, 4)
    assert bus.load(va + 0x34, 4) == 0xCAFE
    pte = bus.load_phys(leaf_table + 2 * 4, 4)
    assert pte & (1 << 6) and not pte & (1 << 7)  # A set, D clear
    bus.store(va + 0x38, 77, 4)
    assert bus.load_phys(frame + 0x38, 4) == 77
    assert bus.load_phys(leaf_table + 2 * 4, 4) & (1 << 7)  # D set

    with pytest.raises(PageFault):  # X=0 leaf cannot execute
        bus.fetch_word(va)
    with pytest.raises(PageFault):  # unmapped vpn1
        bus.load(0x0080_0000, 4)


def test_sv32_superpage_and_misalignment_fault():
    bus = SystemBus()
    root = DRAM_BASE + 0x4000
    bus.update_addressing_mode("sv32")
    bus.update_ppn(root >> 12)
    bus.update_privilege_mode(SUPERVISOR)

    # 4 MiB superpage at vpn1=0x200 -> DRAM_BASE (ppn1=0x200, ppn0=0)
    _write_pte(bus, root, 0x200, 0x200 << 10, 0xF)  # V|R|W|X
    bus.store_phys(DRAM_BASE + 0x1234, 0xAB, 1)
    assert bus.load(0x8000_1234, 1) == 0xAB
    assert bus.fetch_word(0x8000_1234) == bus.load_phys(DRAM_BASE + 0x1234, 4)

    _write_pte(bus, root, 0x201, (0x200 << 10) | 3, 0xF)  # ppn0 = 3
    with pytest.raises(PageFault):  # ppn0 != 0 on a superpage leaf
        bus.load(0x8040_0000, 1)


def test_sv39_translation_4k_page():
    bus = SystemBus(xlen=64)
    root = DRAM_BASE + 0x10000
    mid = DRAM_BASE + 0x11000
    leaf = DRAM_BASE + 0x12000
    frame = DRAM_BASE + 0x13000
    va = (3 << 30) | (5 << 21) | (7 << 12)
    _write_pte(bus, root, 3, mid >> 12, 0x1, 8)
    _write_pte(bus, mid, 5, leaf >> 12, 0x1, 8)
    _write_pte(bus, leaf, 7, frame >> 12, 0xF, 8)
    bus.update_addressing_mode("sv39")
    bus.update_ppn(root >> 12)
    bus.update_privilege_mode(SUPERVISOR)

    bus.store(va + 8, 0x1122334455667788, 8)
    assert bus.load_phys(frame + 8, 8) == 0x1122334455667788
    # page-cache mode returns the same mapping
    bus.enable_page_cache(True)
    assert bus.load(va + 8, 8) == 0x1122334455667788
    assert bus.load(va + 8, 8) == 0x1122334455667788  # cached hit


def test_machine_mode_mprv_redirects_data_not_fetch():
    bus = SystemBus()
    root = DRAM_BASE + 0x4000
    frame = DRAM_BASE + 0x7000
    leaf_table = DRAM_BASE  # table page at DRAM base for simplicity
    _write_pte(bus, root, 0, leaf_table >> 12, 0x1)
    _write_pte(bus, leaf_table, 3, frame >> 12, 0x7)
    bus.update_addressing_mode("sv32")
    bus.update_ppn(root >> 12)
    bus.update_privilege_mode(MACHINE)
    bus.update_mstatus((1 << 17) | (SUPERVISOR << 9))  # MPRV, MPP=S

    bus.store_phys(frame, 99, 4)
    assert bus.load(0x3000, 4) == 99           # data access: translated
    bus.store_phys(DRAM_BASE + 0x3000, 0x13, 4)
    assert bus.fetch_word(0x8000_3000) == 0x13  # fetch: untranslated
    bus.update_mstatus(0)
    with pytest.raises(RuntimeError):           # MPRV off: 0x3000 unmapped
        bus.load(0x3000, 4)


def test_jolt_device_window_via_bus():
    from jolt_tpu.vm.rv_trace import JoltDevice
    dev = JoltDevice.new()
    dev.inputs.extend(b"\x11\x22\x33\x44")
    bus = SystemBus(jolt_device=dev)
    a = dev.memory_layout.input_start
    assert bus.load_phys(a, 4) == 0x44332211
    bus.store_phys(dev.memory_layout.output_start, 0xAA, 1)
    assert bytes(dev.outputs)[:1] == b"\xaa"
